package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics — the batch twins of
  * [[graft.streaming.StreamOps]], sharing semantics so a pipeline can be
  * developed on historical parquet and deployed on `readStream` unchanged.
  *
  * Scale: both operators shuffle once on (user) / (window, type); the
  * sessionizer is the classic lag+cumsum pattern — per-user windows, no
  * state store, no driver involvement.
  */
object EventOps {

  /** Tumbling-window counts + value sums per event type (batch form of
    * `StreamOps.windowedCounts` — same `window()` semantics).
    */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value",
      windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization over historical events: a new session starts
    * when the previous event of the same user is more than `gapMinutes`
    * older. One shuffle on user; session ids assigned with lag + running
    * sum inside the per-user window.
    */
  def sessionize(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    // microsecond-exact gap (a cast to seconds truncates sub-second parts
    // and misclassifies events straddling the gap boundary)
    val gapExpr: Column = unix_micros(col(tsCol)) -
      lag(unix_micros(col(tsCol)), 1).over(w)
    val newSession = when(
      gapExpr.isNull || gapExpr > gapMinutes * 60L * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
  }

  /** Ordered funnel: per user, the earliest strictly-increasing
    * timestamp chain through `stages` (stage i+1 must occur AFTER the
    * chosen stage-i event). Returns one row per user with one nullable
    * `<stage>_ts` column per stage plus `stage` = number of stages
    * reached.
    *
    * Single-shuffle shape: events group to their user (only ts + a
    * stage ordinal travel, not whole rows), each user's events sort
    * in-row, and one linear `aggregate` scan advances the chain — the
    * greedy earliest-chain scan (first stage-0 hit, then first stage-1
    * hit after it, …) which provably reaches the same depth as any
    * min-chain formulation. No self-join per stage (the naive
    * n-stage spelling is n passes over the event table; this is one),
    * no state beyond n timestamps per user. Per-user event lists are
    * user-activity-bounded — the same per-key-bounded contract as
    * [[sessionize]]'s windows.
    */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val n = stages.length
    // ordinal-encode the stage (non-stage events drop before the
    // shuffle); sort by (ts, ordinal) so same-instant events process in
    // a deterministic order — strict `>` chaining ignores ties anyway
    val ord = stages.zipWithIndex.foldLeft(lit(-1)) {
      case (alt, (s, i)) => when(col(typeCol) === s, i).otherwise(alt)
    }
    val sorted = events
      .withColumn("__ord", ord).where(col("__ord") >= 0)
      // anonymous events (NULL user) cannot be attributed to a chain —
      // grouping them would weld every anonymous hit into one fake
      // journey (adversarial-events sweep); they are excluded, matching
      // the SQL min-chain formulation where NULL never joins
      .where(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col("__ord").as("ord")))).as("__evs"))
    // chain state: array of n nullable timestamps; event x fills slot i
    // when i is the first empty slot, x is stage i, and x.ts is after
    // slot i-1 (or i == 0)
    val zero = array((0 until n).map(_ =>
      lit(null).cast("timestamp")): _*)
    val chain = aggregate(col("__evs"), zero, (acc, x) =>
      transform(sequence(lit(0), lit(n - 1)), i => {
        val cur = element_at(acc, i + 1)
        // previous stage's slot is array position i; element_at is
        // 1-based so i is clamped to >= 1 — safe because `i === 0`
        // makes the whole OR true regardless of the clamped read
        val prev = element_at(acc, greatest(i, lit(1)))
        when(cur.isNotNull, cur)
          .when(x.getField("ord") === i &&
            (i === 0 || (prev.isNotNull && x.getField("ts") > prev)),
            x.getField("ts"))
          .otherwise(lit(null).cast("timestamp"))
      }))
    val withChain = sorted.withColumn("__chain", chain)
    val stageCols = stages.zipWithIndex.map { case (s, i) =>
      element_at(col("__chain"), i + 1).as(s"${s}_ts")
    }
    val reached = aggregate(col("__chain"), lit(0),
      (acc, t) => when(t.isNotNull, acc + 1).otherwise(acc))
    withChain.select((col(userCol) +: stageCols :+
      reached.as("stage")): _*)
  }

  /** Weekly retention cohorts: users cohort by the Monday-truncated week
    * of their FIRST event; each (cohort_week, week_offset) cell counts
    * the cohort's users active in that week. Two shuffles (first-seen
    * per user; distinct user-weeks), then a broadcast-sized rollup —
    * the cohort table is weeks², never data-sized.
    */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__wk"))
      .distinct()
    active.join(firstSeen, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("__wk"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** Type-2 slowly-changing dimension built from an event/change log:
    * consecutive equal values of `attrCol` per key collapse into one
    * versioned validity interval `[valid_from, valid_to)`, `valid_to`
    * null (and `is_current` = 1) on the open current version — the
    * standard warehouse dimension-load shape, derived here instead of
    * maintained by a mutable MERGE.
    *
    * Run detection is the lag-change + running-sum pattern (same shape
    * as [[sessionize]]): one shuffle on the key; `valid_to` comes from
    * `lead` over the per-key version sequence, which reuses the same
    * hash partitioning — no second exchange of the run frame beyond the
    * groupBy. Ordering ties on `tsCol` break on `tieCol` so versions
    * are deterministic. Contract: `attrCol` non-null (null attribute
    * rows would merge into neighboring runs via null-unequal lag
    * semantics).
    */
  def scd2Dimension(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", attrCol: String = "event_type",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(attrCol), 1).over(w)
    // ROWS frame, not the default RANGE one: the q186 oracle pins ROWS
    // UNBOUNDED PRECEDING, and the two diverge if two events tie on
    // (ts, tieCol) within a key (RANGE would sum the whole peer group,
    // merging/duplicating versions). Contract: tieCol SHOULD be unique
    // per key — with ties, ROWS keeps version numbering consistent with
    // the lag() row order instead of silently collapsing versions.
    val versioned = events
      .withColumn("__chg",
        when(prev.isNull || col(attrCol) =!= prev, 1L).otherwise(0L))
      .withColumn("version", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = versioned
      .groupBy(col(keyCol), col("version"), col(attrCol))
      .agg(min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wv = Window.partitionBy(keyCol).orderBy("version")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
  }

  /** First-touch / last-touch conversion attribution: each conversion
    * event (`typeCol` == `convType`) attributes its `valueCol` to the
    * user's FIRST and LAST preceding non-conversion event type. The
    * marketing-attribution staple, computed with two IGNORE-NULLS
    * window lookups over one per-user sort — no per-conversion
    * backward join, so cost is one shuffle on user regardless of how
    * many touches precede each conversion.
    *
    * Output is long-form: (model ∈ first_touch|last_touch, touch_type,
    * n_conversions, attributed_value); conversions with no preceding
    * touch are dropped (nothing to credit).
    */
  def touchAttribution(events: DataFrame, convType: String = "purchase",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    // "preceding rows only" spelled as lag + a RUNNING frame: the
    // (UnboundedPreceding, -1) frame it replaces is not Spark's
    // incremental-accumulator fast path and re-scanned each row's
    // prefix — O(rows²) per user, 16× at 10× events in the r10 sweep;
    // lagging the touch column first makes both lookups
    // (UnboundedPreceding, CurrentRow), which streams in O(rows).
    val wo = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol) =!= convType, col(typeCol))
    val conv = events
      .withColumn("__pt", lag(touch, 1).over(wo))
      .withColumn("first_touch", first(col("__pt"), ignoreNulls = true).over(wr))
      .withColumn("last_touch", last(col("__pt"), ignoreNulls = true).over(wr))
      .where(col(typeCol) === convType)
      // two consumers below (one per attribution model): materialize the
      // windowed frame once instead of running the sort+window twice
      .localCheckpoint(true)
    conv.select(lit("first_touch").as("model"),
        col("first_touch").as("touch_type"), col(valueCol).as("__v"))
      .unionAll(conv.select(lit("last_touch").as("model"),
        col("last_touch").as("touch_type"), col(valueCol).as("__v")))
      .where(col("touch_type").isNotNull)
      .groupBy("model", "touch_type")
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col("__v")), 6).as("attributed_value"))
  }
}
