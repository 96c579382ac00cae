package graft.tools
import org.apache.spark.sql.SparkSession
object PlanTopK {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Seq("q58_tfidf_topk", "q24_ann_brute", "q67_bm25", "q25_ann_lsh",
      "q72_ann_quantized", "q146_hybrid_rrf").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $q WindowGroupLimit=${plan.contains("WindowGroupLimit")}")
    }
    spark.stop()
  }
}
