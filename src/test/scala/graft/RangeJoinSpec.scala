package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)

  private val pSchema = StructType(Seq(
    StructField("k", StringType), StructField("ts", LongType),
    StructField("pid", IntegerType)))
  private val iSchema = StructType(Seq(
    StructField("k", StringType), StructField("s", LongType),
    StructField("e", LongType), StructField("iid", IntegerType)))

  // intervals: a:[0,100], a:[50,150] (overlap), a:[7200,7300] (far bin),
  // b:[0,100]
  private val intervals = df(iSchema,
    Row("a", 0L, 100L, 1), Row("a", 50L, 150L, 2),
    Row("a", 7200L, 7300L, 3), Row("b", 0L, 100L, 4))
  private val points = df(pSchema,
    Row("a", 75L, 10),   // inside both a-intervals
    Row("a", 100L, 11),  // inclusive end of iid=1
    Row("a", 151L, 12),  // just outside iid=2
    Row("a", 7250L, 13), // in the far interval, different bin
    Row("b", 75L, 14),   // key isolation: only iid=4
    Row("c", 75L, 15))   // no intervals for key

  test("containment, inclusive bounds, overlaps, key isolation") {
    val out = RangeJoin.intervalJoin(points, intervals, Seq("k"),
      "ts", "s", "e", Seq("iid"), binSeconds = 60L)
      .select("pid", "iid").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out == Set((10, 1), (10, 2), (11, 1), (11, 2), (13, 3), (14, 4)))
  }

  test("plan is an equi-join on (key, bin) — no nested-loop join") {
    val q = RangeJoin.intervalJoin(points, intervals, Seq("k"),
      "ts", "s", "e", Seq("iid"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("timestamp columns bin correctly across bin boundaries") {
    val ts = (sec: Long) => new java.sql.Timestamp(sec * 1000L)
    val p = df(StructType(Seq(StructField("k", StringType),
      StructField("ts", TimestampType), StructField("pid", IntegerType))),
      Row("a", ts(3599), 1), Row("a", ts(3600), 2), Row("a", ts(9999), 3))
    val i = df(StructType(Seq(StructField("k", StringType),
      StructField("s", TimestampType), StructField("e", TimestampType),
      StructField("iid", IntegerType))),
      Row("a", ts(3000), ts(4000), 7)) // spans the 3600 bin boundary
    val out = RangeJoin.intervalJoin(p, i, Seq("k"), "ts", "s", "e",
      Seq("iid")).select("pid").collect().map(_.getInt(0)).toSet
    assert(out == Set(1, 2))
  }
}
