package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, RegExpReplace, RegExpExtractAll, StringSplit}

/** One-off audit: counts expensive expression nodes (regex ops) in every
  * query's optimized plan to flag CollapseProject/Generate fanout (the
  * round-8 lshIndexRows pathology: 33 inlined copies of the tokenizer).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        var regex = 0; var split = 0
        plan.foreach { node =>
          node.expressions.foreach(_.foreach {
            case _: RegExpReplace => regex += 1
            case _: RegExpExtractAll => regex += 1
            case _: StringSplit => split += 1
            case _ =>
          })
        }
        if (regex + split > 20)
          println(f"$name%-26s regex=$regex%3d split=$split%3d  <-- FANOUT?")
        else println(f"$name%-26s regex=$regex%3d split=$split%3d")
      } catch { case e: Throwable =>
        println(f"$name%-26s ERR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
