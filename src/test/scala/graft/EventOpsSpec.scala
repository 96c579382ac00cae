package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.ops.EventOps

/** Funnel and retention-cohort edge cases the q99/q100 oracles can't
  * isolate: timestamp ties, out-of-order stage arrivals, stage skipping,
  * and cohort-offset arithmetic across week boundaries.
  */
class EventOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def evFrame(rows: (Long, String, String)*): DataFrame = {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (u, t, e) => Row(u, ts(t), e) })
        .asJava), schema)
  }

  test("funnel: strict ordering, ties, skips, and partial chains") {
    val df = evFrame(
      // user 1: clean 3-stage chain
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      // user 2: purchase BEFORE click -> chain stops at click
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:10:00", "purchase"),
      (2L, "2024-01-01 09:20:00", "click"),
      // user 3: click at the SAME instant as view -> strict > rejects it
      (3L, "2024-01-01 08:00:00", "view"),
      (3L, "2024-01-01 08:00:00", "click"),
      // user 4: starts mid-funnel (no view) -> stage 0
      (4L, "2024-01-01 07:00:00", "click"),
      (4L, "2024-01-01 07:30:00", "purchase"),
      // user 5: earliest chain wins — a later view must not shift it
      (5L, "2024-01-01 06:00:00", "view"),
      (5L, "2024-01-01 06:30:00", "click"),
      (5L, "2024-01-01 06:10:00", "view"))
    val out = EventOps.funnel(df, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    def stage(r: Row) = r.getInt(4)
    assert(stage(out(0)) == 3)
    assert(stage(out(1)) == 2) // view, then click at 09:20; purchase was too early
    assert(out(1).getTimestamp(2) == ts("2024-01-01 09:20:00"))
    assert(out(1).isNullAt(3))
    assert(stage(out(2)) == 1) // tie does not advance
    assert(stage(out(3)) == 0) // never viewed
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))
    assert(stage(out(4)) == 2)
    assert(out(4).getTimestamp(1) == ts("2024-01-01 06:00:00"))
    assert(out(4).getTimestamp(2) == ts("2024-01-01 06:30:00"))
  }

  test("funnel: users with no stage events are absent; 1-stage works") {
    val df = evFrame(
      (1L, "2024-01-01 10:00:00", "error"),
      (2L, "2024-01-01 10:00:00", "view"))
    val out = EventOps.funnel(df, Seq("view", "click", "purchase"))
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    val one = EventOps.funnel(df, Seq("view")).collect()
    assert(one.length == 1 && one(0).getInt(2) == 1)
  }

  test("retention cohorts: offsets count whole weeks from the cohort Monday") {
    val df = evFrame(
      // user 1 first seen Tue week0; active again week0 (Fri) and week2
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-05 10:00:00", "view"),
      (1L, "2024-01-16 10:00:00", "view"),
      // user 2 first seen week1 only
      (2L, "2024-01-10 10:00:00", "view"))
    val out = EventOps.retentionCohorts(df)
      .orderBy("cohort_week", "week_offset").collect()
    // 2024-01-01 is a Monday; cohorts truncate there
    val rows = out.map(r => (r.getTimestamp(0).toString.take(10),
      r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(
      ("2024-01-01", 0L, 1L), // user 1 week0 (two events, one cell)
      ("2024-01-01", 2L, 1L), // user 1 week2
      ("2024-01-08", 0L, 1L))) // user 2
  }

  /** (user_id, event_id, ts, event_type, value) frame for the SCD-2 and
    * attribution operators, which need the event_id tiebreak and value.
    */
  private def evFrameId(rows: (Long, Long, String, String, Double)*)
      : DataFrame = {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (u, i, t, e, v) =>
          Row(u, i, ts(t), e, v) }).asJava), schema)
  }

  test("scd2Dimension: runs collapse, ties break on event_id, intervals tile") {
    val df = evFrameId(
      // user 1: A A B A -> versions A(2 events), B, A again (type alone
      // is NOT the version key - recurrence opens a new version)
      (1L, 1L, "2024-01-01 10:00:00", "A", 0.0),
      (1L, 2L, "2024-01-01 11:00:00", "A", 0.0),
      (1L, 3L, "2024-01-01 12:00:00", "B", 0.0),
      (1L, 4L, "2024-01-01 13:00:00", "A", 0.0),
      // user 2: ts tie - event_id orders B before A
      (2L, 1L, "2024-01-01 10:00:00", "B", 0.0),
      (2L, 2L, "2024-01-01 10:00:00", "A", 0.0),
      // user 3: single event -> one open version
      (3L, 9L, "2024-01-01 10:00:00", "C", 0.0))
    val out = EventOps.scd2Dimension(df)
      .orderBy("user_id", "version").collect()
    val rows = out.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getTimestamp(3).toString.take(19), r.getLong(4),
      Option(r.getTimestamp(5)).map(_.toString.take(19)), r.getLong(6)))
    assert(rows.toSeq == Seq(
      (1L, 1L, "A", "2024-01-01 10:00:00", 2L,
        Some("2024-01-01 12:00:00"), 0L),
      (1L, 2L, "B", "2024-01-01 12:00:00", 1L,
        Some("2024-01-01 13:00:00"), 0L),
      (1L, 3L, "A", "2024-01-01 13:00:00", 1L, None, 1L),
      (2L, 1L, "B", "2024-01-01 10:00:00", 1L,
        Some("2024-01-01 10:00:00"), 0L),
      (2L, 2L, "A", "2024-01-01 10:00:00", 1L, None, 1L),
      (3L, 1L, "C", "2024-01-01 10:00:00", 1L, None, 1L)))
    // interval-tiling invariants: per user exactly one open version, and
    // every closed valid_to equals the next version's valid_from
    assert(rows.count(_._7 == 1L) == 3)
    assert(rows.groupBy(_._1).forall { case (_, rs) =>
      rs.sortBy(_._2).toList.sliding(2).forall {
        case a :: b :: Nil => a._6.contains(b._4)
        case _ => true
      }
    })
  }

  test("scd2Dimension: full (ts, event_id) sort-key tie still yields " +
      "distinct versions (ROWS running-sum frame, not RANGE)") {
    // two events identical on BOTH sort keys but different types: the
    // default RANGE frame would sum the whole peer group (both rows get
    // version 2, merging into a phantom single version per type with
    // the change flags double-counted); the ROWS frame versions them
    // 1 and 2 in row order. Peer order within the tie is not pinned,
    // so assert the order-independent invariants only.
    val out = EventOps.scd2Dimension(evFrameId(
        (1L, 7L, "2024-01-01 10:00:00", "A", 0.0),
        (1L, 7L, "2024-01-01 10:00:00", "B", 0.0)))
      .collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
    assert(out.map(_.getString(2)).toSet == Set("A", "B"))
    assert(out.count(_.getLong(6) == 1L) == 1) // exactly one open version
  }

  test("touchAttribution: first/last touch credit, conversions without " +
      "touches drop, purchases never self-credit") {
    val df = evFrameId(
      // user 1: view -> click -> purchase(10): first=view, last=click
      (1L, 1L, "2024-01-01 10:00:00", "view", 0.0),
      (1L, 2L, "2024-01-01 10:05:00", "click", 0.0),
      (1L, 3L, "2024-01-01 10:10:00", "purchase", 10.0),
      // then a second purchase(5): the FIRST purchase is not a touch,
      // so first=view still, last=click still
      (1L, 4L, "2024-01-01 10:20:00", "purchase", 5.0),
      // user 2: purchase with no preceding event -> dropped entirely
      (2L, 1L, "2024-01-01 09:00:00", "purchase", 99.0),
      // user 3: single touch doubles as first AND last
      (3L, 1L, "2024-01-01 08:00:00", "signup", 0.0),
      (3L, 2L, "2024-01-01 08:30:00", "purchase", 7.0))
    val out = EventOps.touchAttribution(df)
      .orderBy("model", "touch_type").collect()
    val rows = out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getDouble(3))).toSeq
    assert(rows == Seq(
      ("first_touch", "signup", 1L, 7.0),
      ("first_touch", "view", 2L, 15.0),
      ("last_touch", "click", 2L, 15.0),
      ("last_touch", "signup", 1L, 7.0)))
  }
}
