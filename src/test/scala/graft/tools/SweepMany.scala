package graft.tools

import org.apache.spark.sql.SparkSession

/** SCALING.md §6b sweep runner: many queries × many sfDirs in ONE JVM
  * (BenchOne pays ~10 s sbt+Spark startup per query; a 15-query two-dir
  * sweep is 30 invocations). Protocol per (dir, query): one untimed
  * warmup, then min of 2 timed runs — the §6b convention.
  *
  * Usage: runMain graft.tools.SweepMany q135_winnowing,q149_wordset
  *   /root/testdata/sf0.1 /tmp/sf1.0
  */
object SweepMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dirs = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; dir <- dirs) {
      try {
        val q = graft.SparkEntry.queries(name)
        q(spark, dir).count() // untimed warmup
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          q(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"SWEEP $name $dir ${times.min}%6.3f s")
      } catch {
        case e: Throwable =>
          println(s"SWEEP $name $dir FAILED ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
