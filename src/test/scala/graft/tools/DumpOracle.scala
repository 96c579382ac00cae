package graft.tools

/** Dev utility: print one query's oracle SQL (or with no args, the whole
  * oracle map as JSON) without spinning up a SparkSession — for quick
  * DuckDB iteration on a single new oracle.
  */
object DumpOracle {
  def main(args: Array[String]): Unit =
    if (args.nonEmpty) println(graft.SparkEntry.oracleSql(args(0)))
    else {
      val entries = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).map {
        case (k, v) =>
          val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
            .replace("\n", "\\n")
          s""""$k": "$esc""""
      }
      println(entries.mkString("{", ",\n", "}"))
    }
}
