package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Scratch profiler for the trigram edge pipeline (q39/q118/q140 shared
  * cost): times the trigram-set build and the consecutive-pair jaccard
  * join separately so optimization lands where the time actually is.
  */
object ProfTri {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 3).foreach { i =>
      println(s"-- pass $i")
      time("scan+count") { docs.count() }
      // EXACT triFrame spelling: normText materialized as an attribute
      // first, so the HOF lambda captures a column ref (inlining it
      // re-evaluates normText per gram — 5x penalty, measured here once)
      val tri = docs
        .select(col("doc_id"), TextOps.normText(col("text")).as("t"))
        .select(col("doc_id"),
          array_distinct(transform(TextOps.charNgrams(col("t"), 3),
            g => xxhash64(g))).as("g"))
      time("triFrame (declarative)") {
        tri.select(sum(size(col("g")))).head()
      }
      val d = tri.persist()
      val a = d.select(col("doc_id").as("id1"), col("g").as("g1"))
      val b = d.select(col("doc_id").as("id2"), col("g").as("g2"))
      val edges = a.join(b, col("id2") === col("id1") + 1)
        .withColumn("inter", size(array_intersect(col("g1"), col("g2"))))
        .withColumn("jaccard", col("inter").cast("double") /
          nullif(size(col("g1")) + size(col("g2")) - col("inter"), lit(0)))
        .where(col("jaccard") >= 0.5)
        .select("id1", "id2")
      time("edges (join+intersect)") { edges.count() }
      d.unpersist()
      time("norm only") {
        docs.select(sum(length(TextOps.normText(col("text"))))).head()
      }
      time("grams attr-captured") {
        docs.select(TextOps.normText(col("text")).as("t"))
          .select(sum(size(TextOps.charNgrams(col("t"), 3)))).head()
      }
      time("grams INLINED (anti-pattern)") {
        docs.select(sum(size(
          TextOps.charNgrams(TextOps.normText(col("text")), 3)))).head()
      }
    }
    spark.stop()
  }
}
