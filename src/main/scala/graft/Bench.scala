package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every SparkEntry query at
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line for the driver.
  * Queries run sorted by name; timing includes the full action
  * (plan + execute + count).
  *
  * Each query runs `runs` times (default 2) and reports the per-query MIN:
  * the first execution of a plan shape pays JIT + janino codegen
  * compilation (measured at 2-3x steady state for the LSH queries) and a
  * shared machine adds load spikes — the min is the reproducible
  * engine-speed figure. Round-3 driver runs on a loaded box mis-flagged
  * two 8-10x phantom regressions that a quiet re-run dissolved.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM (classloading, codegen, parquet reader) with one small
    // untimed query so per-query timings measure steady-state execution
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // dev-loop filter: comma-separated name substrings; unset (the
    // driver's mode) = run everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq).getOrElse(Seq.empty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
