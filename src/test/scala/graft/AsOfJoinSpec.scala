package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)

  private val lSchema = StructType(Seq(
    StructField("k", StringType), StructField("ts", LongType),
    StructField("lv", DoubleType)))
  private val rSchema = StructType(Seq(
    StructField("k", StringType), StructField("rts", LongType),
    StructField("rv", DoubleType)))

  private val left = df(lSchema,
    Row("a", 10L, 1.0), Row("a", 20L, 2.0), Row("a", 5L, 0.5),
    Row("b", 10L, 3.0))
  private val right = df(rSchema,
    Row("a", 8L, 80.0), Row("a", 15L, 150.0), Row("a", 20L, 200.0),
    Row("c", 1L, 999.0))

  test("backward picks latest right at or before left ts, per key") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rts", "rv")).orderBy("k", "ts").collect()
    // a@5 -> none, a@10 -> r@8, a@20 -> r@20 (tie included), b -> none
    assert(out.map(r => (r.getString(0), r.getLong(1),
      Option(r.get(3)), Option(r.get(4)))).toSeq == Seq(
      ("a", 5L, None, None),
      ("a", 10L, Some(8L), Some(80.0)),
      ("a", 20L, Some(20L), Some(200.0)),
      ("b", 10L, None, None)))
  }

  test("forward picks earliest right at or after left ts") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts", "rts",
      Seq("rts", "rv")).orderBy("k", "ts").collect()
    // a@5 -> r@8, a@10 -> r@15, a@20 -> r@20, b -> none
    assert(out.map(r => (r.getString(0), r.getLong(1),
      Option(r.get(3)))).toSeq == Seq(
      ("a", 5L, Some(8L)), ("a", 10L, Some(15L)),
      ("a", 20L, Some(20L)), ("b", 10L, None)))
  }

  test("tolerance nulls out stale matches but keeps the left row") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rts", "rv"), toleranceSec = Some(2.0))
      .orderBy("k", "ts").collect()
    // a@10 matches r@8 at age 2 (kept); a@20 matches r@20 at age 0
    assert(out.map(r => (r.getString(0), r.getLong(1),
      Option(r.get(3)))).toSeq == Seq(
      ("a", 5L, None), ("a", 10L, Some(8L)),
      ("a", 20L, Some(20L)), ("b", 10L, None)))
  }

  test("plan shuffles once, on the key — no cross-product join") {
    val q = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("rv"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
  }
}
