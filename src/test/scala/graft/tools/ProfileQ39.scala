package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage timing for q39 (not part of the library). */
object ProfileQ39 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 3).foreach { i =>
      println(s"--- pass $i")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val d = docs.select(col("doc_id"),
        graft.ops.TextOps.normText(col("text")).as("t"))
        .select(col("doc_id"),
          array_distinct(graft.ops.TextOps.charNgrams(col("t"), 3)).as("g"))
      val a = d.select(col("doc_id").as("id1"), col("g").as("g1"))
      val b = d.select(col("doc_id").as("id2"), col("g").as("g2"))
      val jac = a.join(b, col("id2") === col("id1") + 1)
        .withColumn("inter", size(array_intersect(col("g1"), col("g2"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("g1")) + size(col("g2")) - col("inter")))
        .select("id1", "id2", "jaccard")
      t("jaccard count")(jac.count())
      val edges = jac.where(col("jaccard") >= 0.5)
      val e0 = t("edges checkpoint")(
        edges.select(col("id1").cast("long").as("a"),
          col("id2").cast("long").as("b")).localCheckpoint(true))
      t("edge count")(e0.count())
      val cc = t("cc build")(graft.ops.Dedup.connectedComponents(
        edges, "id1", "id2", docs, "doc_id"))
      t("cc collect")(cc.orderBy("doc_id").count())
    }
    spark.stop()
  }
}
