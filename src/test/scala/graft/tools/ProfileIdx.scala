package graft.tools
import org.apache.spark.sql.SparkSession

/** One-off: how many times does the executed q76 plan materialize the
  * batch-side lshIndexRows mapPartitions, and does exchange reuse fire?
  */
object ProfileIdx {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q76_neardup_incremental")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    def cnt(s: String) = s.r.findAllIn(p).size
    println("== node counts in final executed plan ==")
    Seq("MapPartitions", "ReusedExchange", "Exchange", "FileScan",
      "SortMergeJoin", "BroadcastHashJoin").foreach { n =>
      println(f"$n%-20s ${cnt(n)}")
    }
    spark.stop()
  }
}
