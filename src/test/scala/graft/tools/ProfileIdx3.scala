package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm A/B: self-contained nearDupAgainst vs persisted-index screen at a dir. */
object ProfileIdx3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("u", graft.ops.Sampling.hashUnit(col("doc_id")))
    val standing = d.where(col("u") < 0.5).select("doc_id", "text")
    val batch = d.where(col("u") >= 0.5).select("doc_id", "text")
    val idxPath = "/tmp/pi3_idx"
    def self() = graft.ops.Dedup.nearDupAgainst(batch, standing,
      "doc_id", "text", minJaccard = 0.5).count()
    def viaIdx() = {
      graft.ops.Dedup.lshIndexRows(standing, "doc_id", "text", 32, 8)
        .select("doc_id", "band", "bucket")
        .write.mode("overwrite").parquet(idxPath)
      graft.ops.Dedup.nearDupAgainstIndex(batch,
        spark.read.parquet(idxPath), standing, "doc_id", "text", 0.5).count()
    }
    def time(nm: String, f: () => Long): Unit = {
      f() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f()
        ((System.nanoTime() - t0) / 1e9, n) }
      println(f"$nm%-10s min ${ts.map(_._1).min}%.2f s  (n=${ts.head._2})")
    }
    time("self", self _)
    time("viaIndex", viaIdx _)
    spark.stop()
  }
}
