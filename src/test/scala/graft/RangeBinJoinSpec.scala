package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** The hint-driven range-join binning rewrite
  * (plans.RangeBinHintRule/RangeBinJoinRule): a NAIVE
  * point-in-interval join with `.hint("range_bin", secs)` must produce
  * the binned equi-join plan and exactly the naive results.
  */
class RangeBinJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:30:00")),
      (1L, ts("2024-01-01 13:30:00")),
      (2L, ts("2024-01-01 10:30:00")),
      (3L, ts("2024-01-02 09:00:00")))
      .toDF("k", "p_ts")
  }

  private def intervals = {
    import spark.implicits._
    Seq(
      // short interval, same bin
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 100L),
      // LONG interval spanning many 1 h bins — explode must cover them
      (1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 23:00:00"), 101L),
      (2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00"), 200L))
      .toDF("k", "s_ts", "e_ts", "iv_id")
  }

  test("hinted naive range join: binned plan, exact naive results, " +
      "multi-bin intervals covered") {
    val p = points; val iv = intervals
    val cond = p("k") === iv("k") &&
      p("p_ts") >= iv("s_ts") && p("p_ts") <= iv("e_ts")
    val naive = p.join(iv, cond)
      .select(p("k"), col("p_ts"), col("iv_id"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .toSet
    val hinted = p.join(iv.hint("range_bin", 3600), cond)
      .select(p("k"), col("p_ts"), col("iv_id"))
    val plan = hinted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_bin"), s"rewrite did not fire:\n$plan")
    assert(plan.contains("sequence("), s"no interval bin explode:\n$plan")
    val got = hinted.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got == naive, s"got $got\nexpected $naive")
    // the multi-bin interval matched a point 4 bins into it
    assert(got.contains((1L, ts("2024-01-01 13:30:00"), 101L)))
    // no marker node may survive to the physical plan
    assert(!hinted.queryExecution.executedPlan.toString
      .contains("RangeBinHint"))
  }

  test("PURE range join (no equi key): unhinted plans a nested-loop " +
      "cross product, hinted becomes an equi-join on the bins") {
    val p = points.select(col("p_ts"))
    val iv = intervals.select(col("s_ts"), col("e_ts"), col("iv_id"))
    val cond = p("p_ts") >= iv("s_ts") && p("p_ts") <= iv("e_ts")
    val naive = p.join(iv, cond)
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val expected = naive.collect()
      .map(r => (r.getTimestamp(0), r.getLong(3))).toSet
    val hinted = p.join(iv.hint("range_bin", 3600), cond)
    val phys = hinted.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"),
      s"still a nested loop:\n$phys")
    val got = hinted.collect()
      .map(r => (r.getTimestamp(0), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("a stray hint with no eligible join is stripped, not fatal") {
    val df = intervals.hint("range_bin", 60)
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(df.collect().map(_.getLong(1)).sum == 3L)
  }

  test("malformed interval (e < s) and NULL bounds degrade to the " +
      "naive join's empty match, not a Sequence runtime failure") {
    import spark.implicits._
    val p = points
    val iv = Seq(
      // healthy interval — must still match
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 100L),
      // REVERSED interval: naive join matches nothing; the hinted
      // plan's Sequence(bin(s), bin(e)) would throw start > stop
      (1L, ts("2024-01-03 00:00:00"), ts("2024-01-01 00:00:00"), 666L),
      // NULL bound: naive join matches nothing
      (1L, null.asInstanceOf[Timestamp], ts("2024-01-01 11:00:00"), 667L))
      .toDF("k", "s_ts", "e_ts", "iv_id")
    val cond = p("k") === iv("k") &&
      p("p_ts") >= iv("s_ts") && p("p_ts") <= iv("e_ts")
    val hinted = p.join(iv.hint("range_bin", 3600), cond)
      .select(p("k"), col("p_ts"), col("iv_id"))
    val plan = hinted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_bin"), s"rewrite did not fire:\n$plan")
    val got = hinted.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got == Set((1L, ts("2024-01-01 10:30:00"), 100L)))
  }

  test("rewrite fires through an intervening Project/Filter between " +
      "the marker and the join (optimizer-inserted or user-written)") {
    val p = points
    // the extra derived column + filter put Project/Filter nodes above
    // the RangeBinHint marker in the analyzed plan; the unwrap must
    // still find the marker and the rewrite must still fire
    val iv = intervals.hint("range_bin", 3600)
      .withColumn("iv_tag", concat(lit("iv-"), col("iv_id")))
      .where(col("iv_id") > 0L)
    val cond = p("k") === iv("k") &&
      p("p_ts") >= iv("s_ts") && p("p_ts") <= iv("e_ts")
    val ivPlain = intervals
      .withColumn("iv_tag", concat(lit("iv-"), col("iv_id")))
      .where(col("iv_id") > 0L)
    val naive = p.join(ivPlain,
      p("k") === ivPlain("k") && p("p_ts") >= ivPlain("s_ts") &&
        p("p_ts") <= ivPlain("e_ts"))
      .select(p("k"), col("p_ts"), col("iv_tag"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .toSet
    val hinted = p.join(iv, cond)
      .select(p("k"), col("p_ts"), col("iv_tag"))
    val plan = hinted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_bin"),
      s"rewrite did not fire through the Project/Filter chain:\n$plan")
    val got = hinted.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == naive)
    assert(!hinted.queryExecution.executedPlan.toString
      .contains("RangeBinHint"))
  }
}
