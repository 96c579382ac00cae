package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextOps

/** Structured-Streaming operators for the event/ingest side of the pipeline.
  *
  * These run identically over `readStream` sources and batch frames (the
  * transformations are plan-level); streaming semantics — watermarks, state
  * stores, output modes — engage when the input is a streaming DataFrame.
  *
  * Scale: windowed aggregations shuffle on (window, key) and keep per-window
  * partial state in the state store; watermarks bound that state. The
  * sessionizer keys state by user so it distributes with the groupBy
  * shuffle; its state object is O(1) per live key.
  */
object StreamOps {

  /** Sliding-window event counts + value sums per event type, with an
    * event-time watermark bounding state retention.
    */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value",
      windowLen: String = "1 hour", slide: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n_events"), col("sum_value"))

  /** Streaming OHLC bars: open/high/low/close of `valueCol` per
    * (type, tumbling bar) — the streaming twin of the batch q200 bar
    * aggregation. Open/close pick by min_by/max_by over the
    * (ts, event_id) struct: the same total order the batch twin's
    * row_number walks, expressed as single-pass streaming-legal
    * aggregates (window functions don't stream). The watermark bounds
    * per-(type, bar) state to the horizon; bars emit finalized in
    * append mode.
    */
  def ohlcStreaming(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id",
      valueCol: String = "value", barLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), barLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        min_by(col(valueCol), struct(col(tsCol), col(idCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), struct(col(tsCol), col(idCol))).as("close"))
      .select(col("window.start").as("bar"), col(typeCol),
        col("n_events"), col("open"), col("high"), col("low"),
        col("close"))

  /** Streaming exact dedup on normalized-content hash: with a watermark,
    * the dedup state store is bounded to the watermark horizon — the
    * streaming analogue of [[graft.ops.Dedup.exact]].
    */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", TextOps.contentHash(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("content_hash")

  /** Stream-static exact dedup: drop streaming documents whose normalized
    * content already exists in a standing corpus — the serving twin of
    * [[graft.ops.Dedup.exactAgainst]] (daily-crawl ingest against
    * yesterday's corpus, as a continuous stream).
    *
    * A stream-static LEFT ANTI equi-join on the content hash: stateless,
    * append-mode, no watermark needed — the static side is the only
    * lookup and the stream never accumulates state. The static subtree
    * re-executes EVERY micro-batch in a stream-static join, so the
    * hashed+deduped reference is persisted here — each trigger then
    * probes the cached hash table instead of re-aggregating the standing
    * corpus; the cache lives as long as the query (the intended
    * lifetime for a serving join's reference side). Compose with
    * [[streamingDedup]] upstream to also drop within-stream repeats
    * (watermark-bounded), mirroring how q55 composes the two batch modes.
    */
  def dedupAgainstStatic(stream: DataFrame, static: DataFrame,
      textCol: String): DataFrame = {
    val ref = static
      .select(TextOps.contentHash(col(textCol)).as("__ref_hash")).distinct()
      .persist()
    stream
      .withColumn("__h", TextOps.contentHash(col(textCol)))
      .join(ref, col("__h") === col("__ref_hash"), "left_anti")
      .drop("__h")
  }

  /** [[dedupAgainstStatic]] with the Bloom pre-screen — the streaming
    * twin of [[graft.ops.Dedup.exactAgainstBloom]]. The Bloom binary is
    * built ONCE at query-build time (driver-side, like the batch
    * operator's) and rides into every micro-batch as a literal:
    * definite-misses pass map-side without touching the anti-join, only
    * `might_contain` maybes pay the stream-static join against the
    * persisted reference hashes. No false negatives, so the kept rows
    * are identical to [[dedupAgainstStatic]]'s (StreamingSpec pins
    * batch parity); the fpp sliver only costs join traffic. State: none
    * beyond the same persisted ref side — the filter itself is
    * stateless, which is the point: at serving scale most arriving docs
    * are misses and never shuffle at all.
    */
  def dedupAgainstStaticBloom(stream: DataFrame, static: DataFrame,
      textCol: String, fpp: Double = 0.01): DataFrame = {
    val ref = static
      .select(TextOps.contentHash(col(textCol)).as("__ref_hash")).distinct()
      .persist()
    val n = ref.count()
    if (n == 0) return stream
    val numBits = math.max(64L,
      math.ceil(-n.toDouble * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    val bloom = ref
      .agg(expr(s"bloom_filter_agg(xxhash64(__ref_hash), ${n}L, ${numBits}L)"))
      .head().getAs[Array[Byte]](0)
    val keyed = stream
      .withColumn("__h", TextOps.contentHash(col(textCol)))
      .withColumn("__maybe", coalesce(
        call_function("might_contain", lit(bloom), xxhash64(col("__h"))),
        lit(false)))
    keyed.where(!col("__maybe"))
      .unionByName(keyed.where(col("__maybe"))
        .join(ref, col("__h") === col("__ref_hash"), "left_anti"))
      .drop("__h", "__maybe")
  }

  /** Stream-static NEAR-DUP screen: LSH matches between streaming
    * documents and a standing corpus — the near-dup analogue of
    * [[dedupAgainstStatic]] and the streaming twin of
    * [[graft.ops.Dedup.minHashLshAgainstPairs]].
    *
    * Entirely STATELESS: both sides index with
    * [[graft.ops.Dedup.lshIndexRows]] (signatures as in-row array_min —
    * no aggregation state store), candidates meet in a stream-static
    * equi-join on (band, bucket), and true Jaccard verifies in-row from
    * the carried shingle arrays. A pair sharing several bands would
    * emit once per band; instead each match emits exactly once — on its
    * SMALLEST shared band, computed in-row from the two carried bucket
    * arrays — so no dropDuplicates state is ever needed. Same hash
    * arithmetic as the batch operator, so stream matches equal batch
    * matches (spec-pinned).
    *
    * The static index is persisted (a stream-static join re-executes
    * the static subtree every micro-batch otherwise); it lives as long
    * as the query, the intended lifetime for a serving join's reference
    * side.
    *
    * @return (new_id, ref_id, jaccard) matches; route downstream to
    *         quarantine/drop. Emits once per pair per arrival — a
    *         re-sent document re-matches (pair with [[streamingDedup]]
    *         upstream to suppress within-stream repeats).
    */
  def nearDupAgainstStatic(stream: DataFrame, static: DataFrame,
      idCol: String, textCol: String, minJaccard: Double,
      numHashes: Int = 16, bands: Int = 4,
      shingleWidth: Int = 3): DataFrame = {
    val refIdx = graft.ops.Dedup
      .lshIndexRows(static, idCol, textCol, numHashes, bands, shingleWidth)
      .select(col(idCol).as("ref_id"), col("__shs").as("__ref_shs"),
        col("__buckets").as("__ref_buckets"), col("band"), col("bucket"))
      .persist()
    val newIdx = graft.ops.Dedup
      .lshIndexRows(stream, idCol, textCol, numHashes, bands, shingleWidth)
      .select(col(idCol).as("new_id"), col("__shs").as("__new_shs"),
        col("__buckets").as("__new_buckets"), col("band"), col("bucket"))
    val shared = filter(sequence(lit(0), lit(bands - 1)), i =>
      element_at(col("__new_buckets"), i + 1) ===
        element_at(col("__ref_buckets"), i + 1))
    val inter = size(array_intersect(col("__new_shs"), col("__ref_shs")))
    newIdx.join(refIdx, Seq("band", "bucket"))
      .where(col("band") === array_min(shared))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("__new_shs")) + size(col("__ref_shs")) - inter))
      .where(col("jaccard") >= minJaccard)
      .select("new_id", "ref_id", "jaccard")
  }

  /** Stream-static backward as-of join: each streaming row aligned with
    * the latest static-side row at or before its timestamp, per key —
    * the serving-side twin of [[graft.ops.AsOfJoin.backward]] (enrich a
    * live event stream against a point-in-time feature/reference table).
    *
    * The static side is pre-aggregated once into a per-key time-sorted
    * history array; the stream side then needs only a STATELESS equi-join
    * on the key (stream-static equi-joins run in append mode with no
    * watermark) plus a per-row array scan picking the last entry ≤ ts.
    * No state store, no stream shuffle beyond the join — state cannot
    * grow with the stream. The per-key static history must be
    * serving-sized (it is a feature table, not an unbounded log), which
    * is exactly the regime this join exists for; ties (`r.ts == l.ts`)
    * match, mirroring the batch operator and DuckDB ASOF.
    */
  def asOfJoinStreamStatic(stream: DataFrame, static: DataFrame,
      on: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.intersect(stream.columns.toSeq).isEmpty,
      "rightPayload collides with stream columns")
    // __rts leads the struct so array_sort orders each history by time
    val hist = static.groupBy(on.map(col): _*)
      .agg(array_sort(collect_list(struct(
        (col(rightTs).as("__rts") +: rightPayload.map(col)): _*)))
        .as("__hist"))
    val matches = filter(col("__hist"),
      x => x.getField("__rts") <= col(leftTs))
    // guarded element_at: ANSI-safe on empty/null histories
    val m = when(size(matches) > 0, element_at(matches, size(matches)))
    stream.join(hist, on, "left")
      .select(stream.columns.map(col).toSeq ++
        rightPayload.map(p => m.getField(p).as(p)): _*)
  }

  /** Stream-static interval join: each streaming point row matched to
    * every static interval containing it, per key — the serving twin of
    * [[graft.ops.RangeJoin.intervalJoin]] (tag live events with the
    * reference window/session/campaign they fall in).
    *
    * Same stateless construction as [[asOfJoinStreamStatic]]: the static
    * intervals pack into one per-key array, the stream side is an
    * append-mode equi-join plus an in-row filter+explode — inner
    * semantics (unmatched points drop, one output row per containing
    * interval), matching the batch operator. No state store; the per-key
    * static interval set must be serving-sized.
    */
  def intervalJoinStreamStatic(stream: DataFrame, static: DataFrame,
      on: Seq[String], ptCol: String, startCol: String, endCol: String,
      intervalPayload: Seq[String]): DataFrame = {
    require(intervalPayload.intersect(stream.columns.toSeq).isEmpty,
      "intervalPayload collides with stream columns")
    val packed = static.groupBy(on.map(col): _*)
      .agg(collect_list(struct((col(startCol).as("__s") +:
        col(endCol).as("__e") +: intervalPayload.map(col)): _*)).as("__iv"))
    // inner join: the explode drops no-match rows anyway, so producing
    // them would be dead work
    stream.join(packed, on)
      .withColumn("__m", explode(filter(col("__iv"),
        x => x.getField("__s") <= col(ptCol) &&
          x.getField("__e") >= col(ptCol))))
      .select(stream.columns.map(col).toSeq ++
        intervalPayload.map(p => col("__m").getField(p).as(p)): _*)
  }

  /** Stream-STREAM interval join — Spark's stateful two-sided join, the
    * shape stream-static can't cover: BOTH sides arrive live (clicks ⋈
    * impressions, spans ⋈ points), so both need watermarks and the join
    * condition needs a time bound, or state grows forever. The range
    * predicate `left.ts ∈ [right.ts, right.ts + window]` is exactly
    * what lets Spark expire right-side state past
    * `watermark + window` — an unbounded-time equi-join would be
    * rejected in append mode. Inner semantics; output rows carry both
    * timestamps so parity with the batch interval join is checkable
    * row-for-row (StreamingSpec).
    *
    * State size: O(in-flight window per key), set by the two watermark
    * delays + `windowSeconds` — the knobs a 100 TB stream tunes against
    * its late-data tail, not its history.
    */
  def intervalJoinStreamStream(left: DataFrame, right: DataFrame,
      on: String, leftTs: String, rightTs: String,
      windowSeconds: Long, watermarkDelay: String = "10 seconds")
      : DataFrame = {
    val rightPayload = right.columns.filterNot(_ == on).toSeq
    require(rightPayload.contains(rightTs), s"right side missing $rightTs")
    require(rightPayload.intersect(left.columns.toSeq).isEmpty,
      "right payload collides with left columns")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(r,
        col(s"l.$on") === col(s"r.$on") &&
          col(s"l.$leftTs") >= col(s"r.$rightTs") &&
          col(s"l.$leftTs") <=
            col(s"r.$rightTs") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(left.columns.toSeq.map(c => col(s"l.$c")) ++
        rightPayload.map(c => col(s"r.$c")): _*)
  }

  final case class Event(user_id: Long, ts: Timestamp, event_type: String,
      value: Double)
  final case class SessionState(start: Timestamp, last: Timestamp, n: Long,
      sum: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Long, sum_value: Double)
  /** Funnel chain as epoch-MICROSECOND slots, -1 = stage not reached —
    * long sentinels instead of nested Option encoders, and microsecond
    * precision so stream progress compares exactly against the batch
    * operator's timestamp chain.
    */
  final case class FunnelChain(micros: Seq[Long])
  final case class FunnelProgress(user_id: Long, stage: Int,
      stage_micros: Seq[Long])

  /** Streaming twin of [[graft.ops.EventOps.funnel]]: per-user stage
    * chains advance live via `mapGroupsWithState` — state is exactly n
    * epoch-micros slots per user (O(n), never grows with the stream),
    * and each micro-batch emits the user's current progress (update
    * mode; the latest row per user is the live funnel dashboard).
    *
    * Within a micro-batch events sort by event time (same greedy
    * earliest-chain scan as the batch operator); ACROSS micro-batches
    * the chain is advance-only, so stream progress equals the batch
    * funnel whenever arrival order respects event time per user
    * (StreamingSpec pins cross-batch parity). An event older than an
    * already-filled slot cannot rewrite history — the live-serving
    * contract; replay the batch operator over the full log for
    * retrospective corrections.
    */
  def funnelStreaming(events: Dataset[Event], stages: Seq[String])
      : Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    val n = stages.length
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelChain, FunnelProgress](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[FunnelChain]) =>
          val cur = state.getOption.map(_.micros.toArray)
            .getOrElse(Array.fill(n)(-1L))
          def us(t: Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          it.toSeq.sortBy(e => (us(e.ts), stages.indexOf(e.event_type)))
            .foreach { e =>
              val o = stages.indexOf(e.event_type)
              if (o >= 0 && cur(o) == -1L &&
                (o == 0 || (cur(o - 1) != -1L && us(e.ts) > cur(o - 1))))
                cur(o) = us(e.ts)
            }
          state.update(FunnelChain(cur.toSeq))
          FunnelProgress(user, cur.count(_ != -1L), cur.toSeq)
      }
  }

  final case class Scd2State(attr: String, validFromUs: Long,
      version: Long, n: Long)
  final case class Scd2Closed(user_id: Long, version: Long,
      event_type: String, valid_from: Timestamp, n_events: Long,
      valid_to: Timestamp)

  /** Streaming twin of [[graft.ops.EventOps.scd2Dimension]]: the
    * per-key CURRENT dimension version lives in `flatMapGroupsWithState`
    * state (one fixed-size record per key — attribute, valid_from,
    * version, run length), and the moment the attribute changes a
    * CLOSED version row is emitted with its `[valid_from, valid_to)`
    * interval. Append mode: the emitted log is exactly the closed
    * history; the open version per key is the state itself.
    *
    * Parity contract (StreamingSpec): whenever per-key arrival order
    * respects event time, the streamed closed rows equal the batch
    * operator's `is_current = 0` rows over the same log — the batch
    * rebuild stays the retrospective-correction path for out-of-order
    * replays, same contract as [[funnelStreaming]].
    */
  def scd2Streaming(events: Dataset[Event]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def tsOf(u: Long): Timestamp = {
      val t = new Timestamp(u / 1000L)
      t.setNanos(((u % 1000000L) * 1000L).toInt)
      t
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[Scd2State]) =>
          var closed = List.empty[Scd2Closed]
          var cur = state.getOption
          it.toSeq.sortBy(e => us(e.ts)).foreach { e =>
            cur match {
              case Some(s) if s.attr == e.event_type =>
                cur = Some(s.copy(n = s.n + 1))
              case Some(s) =>
                closed ::= Scd2Closed(user, s.version, s.attr,
                  tsOf(s.validFromUs), s.n, e.ts)
                cur = Some(Scd2State(e.event_type, us(e.ts),
                  s.version + 1, 1L))
              case None =>
                cur = Some(Scd2State(e.event_type, us(e.ts), 1L, 1L))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  final case class TouchState(first: String, last: String)
  final case class Attribution(user_id: Long, conv_ts: Timestamp,
      first_touch: String, last_touch: String, value: Double)

  /** Streaming twin of [[graft.ops.EventOps.touchAttribution]]: per-key
    * state is exactly TWO strings (first and latest non-conversion
    * touch — O(1) per user forever), and each conversion event emits
    * its attribution row the moment it arrives; conversions with no
    * preceding touch emit nothing, and conversions never update the
    * touch state (a purchase is not a touch), both exactly the batch
    * operator's rules. Aggregating the emitted log by
    * (model, touch_type) reproduces the batch rollup — StreamingSpec
    * pins that across micro-batches. Same in-order contract as
    * [[funnelStreaming]]: replay the batch operator for out-of-order
    * corrections.
    */
  def attributionStreaming(events: Dataset[Event],
      convType: String = "purchase"): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[TouchState]) =>
          var s = state.getOption.getOrElse(TouchState(null, null))
          val out = scala.collection.mutable.ListBuffer.empty[Attribution]
          it.toSeq.sortBy(e => us(e.ts)).foreach { e =>
            if (e.event_type == convType) {
              if (s.last != null)
                out += Attribution(user, e.ts, s.first, s.last, e.value)
            } else {
              s = TouchState(
                if (s.first == null) e.event_type else s.first,
                e.event_type)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** Gap-based sessionization via `flatMapGroupsWithState`: a session closes
    * when no event arrives within `gapMs` of the previous one (enforced by
    * event-time timeout against the watermark). Emits one row per closed
    * session.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.last, s.n, s.sum))
          } else {
            val events = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            events.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.last.getTime <= gapMs =>
                  cur = Some(SessionState(s.start, e.ts, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(user, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  final case class KmvState(hvs: Seq[Long])
  final case class KmvSnapshot(g: String, n_k: Int, kth: Long,
      est_distinct: Double)

  /** Streaming KMV sketch maintenance — the live twin of
    * [[graft.ops.Sketches.kmvSketch]]/`kmvMerge`. The HLL registers and
    * grid histograms need no twin at all (they are plain
    * `groupBy.agg(max/count)` plans, streaming-legal as-is —
    * StreamingSpec pins their stream-vs-batch register equality), but
    * KMV's rank windows are not streaming-supported, so the sketch
    * lives in `mapGroupsWithState`: state = the k smallest distinct
    * md5 words seen per group, FOREVER BOUNDED at k longs regardless
    * of stream length (the sketch IS the state — no watermark needed
    * because nothing grows). Each micro-batch emits the group's
    * current snapshot (update mode: latest row per group = the live
    * distinct-count dashboard), with the same sub-k-exact /
    * (k−1)·2³²/kth estimator arithmetic as the batch
    * [[graft.ops.Sketches.kmvEstimate]] — StreamingSpec pins that the
    * final stream state equals the batch sketch of everything that
    * flowed.
    */
  def kmvStreaming(items: DataFrame, groupCol: String, itemCol: String,
      k: Int): Dataset[KmvSnapshot] = {
    import items.sparkSession.implicits._
    val hashed = items.select(col(groupCol).cast("string").as("g"),
      graft.ops.Sampling.md5Prefix32(col(itemCol)).as("hv"))
      .as[(String, Long)]
    hashed
      .groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvSnapshot](
        GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[(String, Long)], state: GroupState[KmvState]) =>
          var set = scala.collection.immutable.SortedSet.empty[Long] ++
            state.getOption.map(_.hvs).getOrElse(Seq.empty)
          it.foreach { case (_, hv) =>
            // insert-then-trim keeps the working set ≤ k+1, never the batch
            if (set.size < k) set += hv
            else if (hv < set.max && !set.contains(hv)) set = (set + hv) - set.max
          }
          state.update(KmvState(set.toSeq))
          val kth = if (set.isEmpty) 0L else set.max
          val est =
            if (set.size < k) set.size.toDouble
            else (k - 1).toLong * 4294967296.0 / kth.toDouble
          KmvSnapshot(g, set.size, kth, est)
      }
  }

  final case class HourBucket(event_type: String, hour_micros: Long, n: Long)
  final case class TrailState(hours: Seq[Long], counts: Seq[Long])
  /** `has_z = false` means warm-up (< minTrail buckets) or zero
    * variance — `z` is then a 0.0 sentinel, mirroring the batch
    * operator's null (long sentinels over nested Options, the
    * [[FunnelChain]] encoder discipline).
    */
  final case class AnomalyScore(event_type: String, hour_micros: Long,
      n: Long, trail_cnt: Long, z: Double, has_z: Boolean,
      is_spike: Boolean)

  /** Streaming twin of the q130 event-rate anomaly screen: per event
    * type the state is a ring of the trailing `window` closed hourly
    * buckets — FOREVER BOUNDED at 2·window longs per type — and each
    * arriving bucket scores against exactly the stats the batch
    * operator's `ROWS BETWEEN window PRECEDING AND 1 PRECEDING` frame
    * computes (same guarded variance arithmetic, same 6-dp half-up
    * rounding). Buckets must arrive in hour order per type (the
    * advance-only live contract, as [[funnelStreaming]]); replay the
    * batch query for retrospective corrections. Update mode: one score
    * per bucket per micro-batch.
    */
  def anomalyStreaming(buckets: Dataset[HourBucket], window: Int = 24,
      minTrail: Int = 12): Dataset[AnomalyScore] = {
    import buckets.sparkSession.implicits._
    require(window > 0 && minTrail > 0)
    buckets
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TrailState, AnomalyScore](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (et: String, it: Iterator[HourBucket],
            state: GroupState[TrailState]) =>
          var hours = state.getOption.map(_.hours.toVector)
            .getOrElse(Vector.empty[Long])
          var counts = state.getOption.map(_.counts.toVector)
            .getOrElse(Vector.empty[Long])
          val out = it.toSeq.sortBy(_.hour_micros).map { b =>
            val sel = hours.zip(counts)
              .filter(_._1 < b.hour_micros).takeRight(window)
            val tc = sel.length.toLong
            val s = sel.map(_._2).sum
            val q = sel.map(p => p._2 * p._2).sum
            val (zv, has) =
              if (tc >= minTrail) {
                val vr = (q.toDouble - s.toDouble * s.toDouble / tc.toDouble) /
                  tc.toDouble
                if (vr > 0.0) {
                  val z = BigDecimal(
                    (b.n.toDouble - s.toDouble / tc.toDouble) / math.sqrt(vr))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  (z, true)
                } else (0.0, false)
              } else (0.0, false)
            hours = (hours :+ b.hour_micros).takeRight(window)
            counts = (counts :+ b.n).takeRight(window)
            AnomalyScore(et, b.hour_micros, b.n, tc, zv, has,
              has && zv > 3.0)
          }
          state.update(TrailState(hours, counts))
          out.iterator
      }
  }
}
