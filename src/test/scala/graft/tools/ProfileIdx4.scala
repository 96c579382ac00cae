package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling}

object ProfileIdx4 {
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
      .withColumn("u", Sampling.hashUnit(col("doc_id")))
    val standing = d.where(col("u") < 0.5).select("doc_id", "text")
    val batch = d.where(col("u") >= 0.5).select("doc_id", "text")
    def digest(idx: DataFrame) = idx
      .groupBy(col("band").cast("long").as("band"))
      .agg(count(lit(1)).as("n_entries"),
        countDistinct(col("bucket")).as("n_buckets"),
        sum(Sampling.md5Prefix32(
          concat_ws("#", col("doc_id"), col("bucket")))).as("content_sum"))
      .orderBy("band")
    def idxOf(part: DataFrame) =
      Dedup.lshIndexRows(part, "doc_id", "text", 32, 8)
        .select("doc_id", "band", "bucket")
    def oldQ89() = {
      val survivors = Dedup.nearDupAgainst(batch, standing, "doc_id",
        "text", minJaccard = 0.5)
      digest(idxOf(standing).unionByName(idxOf(survivors))).count()
    }
    def newQ89() = {
      val p = "/tmp/pi4_idx"
      idxOf(standing).write.mode("overwrite").parquet(p)
      val index = spark.read.parquet(p)
      val survivors = Dedup.nearDupAgainstIndex(batch, index, standing,
        "doc_id", "text", 0.5)
      digest(index.unionByName(idxOf(survivors))).count()
    }
    def time(nm: String, f: () => Long): Unit = {
      f()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f()
        ((System.nanoTime() - t0) / 1e9, n) }
      println(f"$nm%-10s min ${ts.map(_._1).min}%.2f s  (n=${ts.head._2})")
    }
    time("oldQ89", oldQ89 _)
    time("newQ89", newQ89 _)
    spark.stop()
  }
}
