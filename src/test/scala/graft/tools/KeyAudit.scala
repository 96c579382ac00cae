package graft.tools
object KeyAudit {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println("n_queries=" + q.size + " n_oracles=" + o.size)
    println("queries w/o oracle: " + (q -- o).toSeq.sorted.mkString(","))
    println("oracles w/o query:  " + (o -- q).toSeq.sorted.mkString(","))
  }
}
