package graft.kernels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compile.ColumnCompiler.qcol

/** Chain-linked volume indices (FAME `$chain`/`mchain`) and Fisher volume
  * rebasing (`fishvol_rebase`) — SURVEY §2.7.
  *
  * The reference delegates both to a closed external kernel (its dev mock
  * returns `lit(1.0)`, `fame2pygen/polars_econ_mock.py:9-11,38-40`), so the
  * math below follows the published national-accounts methodology
  * (Fisher ideal index, annual-overlap chain linking; e.g. IMF QNA manual
  * ch. 8) and is documented here as this engine's defined semantics:
  *
  *  - Laspeyres link  L_y = Σᵢ sᵢ·p̄ᵢ,y₋₁·Qᵢ,y / Σᵢ sᵢ·p̄ᵢ,y₋₁·Qᵢ,y₋₁
  *  - Paasche  link   P_y = Σᵢ sᵢ·p̄ᵢ,y·Qᵢ,y   / Σᵢ sᵢ·p̄ᵢ,y·Qᵢ,y₋₁
  *  - Fisher   link   F_y = √(L_y·P_y)
  *  - Index level     I_y = Π_{u ≤ y} F_u, re-referenced so base year = 100.
  *
  * where p̄ᵢ,y = annual average price, Qᵢ,y = annual quantity sum, and sᵢ is
  * the term sign (`$chain("a - b + c", …)` subtracts b's contributions,
  * `fame2pygen/formulas_generator.py:605-623`).
  *
  * Execution shape (scales): one `groupBy(year)` shuffle over (keys, year),
  * ordered window over the tiny per-key year table for the cumulative
  * product (`exp(sum(log))`), then a broadcast join back to the fact rows.
  */
object Indices {

  private def win(keys: Seq[String], orderCol: String) =
    if (keys.isEmpty) Window.orderBy(orderCol)
    else Window.partitionBy(keys.map(col): _*).orderBy(orderCol)

  /** Cumulative product of `c` over an ordered window. With the
    * [[graft.plans.GraftExtensions]] extension installed this is the exact
    * native [[graft.plans.ProductAgg]]; otherwise exp∘sum∘log (positive
    * links only — fine for index links, which are guarded > 0 upstream).
    */
  def cumprod(df: DataFrame, c: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val frame = w.rowsBetween(Window.unboundedPreceding, 0)
    if (Kernels.hasProductAgg(df))
      call_function("product_agg", when(c > 0, c)).over(frame)
    else
      exp(sum(when(c > 0, log(c))).over(frame))
  }

  /** Per-(keys, year) chain aggregates — the groupBy stage of
    * [[chainYearly]], exposed on its own because the incremental
    * streaming executor ([[graft.streaming.FameStream.runIncremental]])
    * materializes CLOSED years' rows of this exact table as carried
    * derived state: a year's aggregates are constants once the year
    * closes, and carrying them (1 row per key per year) is what lets
    * the chain recompute its whole link/cumprod/rebase pipeline each
    * batch without carrying O(history) raw rows.
    *
    * @return frame `keys :+ __year :+ (__p$i, __q$i per term)`.
    */
  def yearlyAggs(df: DataFrame, dateCol: String,
      terms: Seq[(Int, String)], keys: Seq[String]): DataFrame = {
    val y = year(col(dateCol)).as("__year")
    val aggs = terms.zipWithIndex.flatMap { case ((_, q), i) =>
      // qcol, not col: a dotted quantity series (`v.dot`) must read as a
      // literal column, not struct access (same class as the r17 q220 find)
      Seq(avg(qcol("P" + q)).as(s"__p$i"), sum(qcol(q)).as(s"__q$i"))
    }
    df.groupBy((keys.map(col) :+ y): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Annually chain-linked Fisher volume index over signed
    * (quantity, price=`P<quantity>`) term pairs.
    *
    * @param terms   (sign, quantityCol) pairs; price col = "P"+quantityCol
    * @param seed    closed-year aggregate rows ([[yearlyAggs]] schema)
    *                carried by the incremental streaming executor: they
    *                REPLACE this frame's own (possibly partial)
    *                aggregates for those years, so a work frame holding
    *                only the open year's raw rows still links against
    *                the complete history. The link/cumprod/rebase
    *                pipeline always recomputes over the FULL year table
    *                (seed ∪ fresh) — the same window fold over the same
    *                year rows as a whole-history run, so seeding changes
    *                no fp association (fishvol's per-row fold instead
    *                seeds a running product — bit-exact only under the
    *                sequential native ProductAgg, which is why its
    *                incremental tier is the opt-in relaxedFp one; see
    *                [[fishvolRaw]]).
    * @return frame `keys :+ __year :+ idxName` (one row per year) to join
    *         back on year.
    */
  def chainYearly(df: DataFrame, dateCol: String, terms: Seq[(Int, String)],
      baseYear: Int, idxName: String, keys: Seq[String] = Nil,
      seed: Option[DataFrame] = None): DataFrame = {

    val fresh = yearlyAggs(df, dateCol, terms, keys)
    val yearly = seed match {
      case Some(st) =>
        // the carried rows are the COMPLETE aggregates for their years
        // (finalized when the year closed); the frame's own rows for
        // those years may be partial (pinned/tail leftovers) — prefer
        // the state
        st.unionByName(fresh.join(
          st.select((keys :+ "__year").map(col): _*),
          keys :+ "__year", "left_anti"))
      case None => fresh
    }

    val w = win(keys, "__year")
    def lagc(name: String) = lag(col(name), 1).over(w)

    def dot(price: Int => Column, qty: Int => Column): Column =
      terms.zipWithIndex.map { case ((s, _), i) =>
        lit(s.toDouble) * price(i) * qty(i)
      }.reduce(_ + _)

    val lasp = dot(i => lagc(s"__p$i"), i => col(s"__q$i")) /
               dot(i => lagc(s"__p$i"), i => lagc(s"__q$i"))
    val paas = dot(i => col(s"__p$i"), i => col(s"__q$i")) /
               dot(i => col(s"__p$i"), i => lagc(s"__q$i"))
    // first-year link (lag null) and degenerate negative products (signed
    // baskets can net below zero) both collapse to a unit link — sqrt(NaN)
    // would otherwise poison the cumulative product
    val lp = lasp * paas
    val fisher = coalesce(sqrt(when(lp > 0, lp)), lit(1.0))

    val linked = yearly
      .withColumn("__f", fisher)
      .withColumn("__raw", cumprod(yearly, col("__f"), w))
    // re-reference so base year = 100
    val baseW =
      if (keys.isEmpty) Window.partitionBy()
      else Window.partitionBy(keys.map(col): _*)
    val base = max(when(col("__year") === baseYear, col("__raw"))).over(baseW)
    linked
      .withColumn(idxName, col("__raw") / base * lit(100.0))
      .select((keys.map(col) :+ col("__year") :+ col(idxName)): _*)
  }

  /** Join a yearly chain index back onto the row-level frame as `idxName`.
    *
    * The broadcast hint is applied only in keyless (single-series) mode,
    * where the yearly side is |years| rows. In keyed mode it is
    * |entities| × |years| — proportional to the corpus — so a forced
    * broadcast would funnel an arbitrarily large build side through the
    * driver; the join key (keys, __year) hash-partitions on its own, and
    * AQE still picks a broadcast at runtime whenever the yearly side
    * turns out genuinely small.
    */
  def chain(df: DataFrame, dateCol: String, terms: Seq[(Int, String)],
      baseYear: Int, idxName: String, keys: Seq[String] = Nil,
      seed: Option[DataFrame] = None): DataFrame = {
    val yearly = chainYearly(df, dateCol, terms, baseYear, idxName, keys,
      seed)
    val build = if (keys.isEmpty) broadcast(yearly) else yearly
    df.withColumn("__year", year(col(dateCol)))
      .join(build, keys :+ "__year", "left")
      .drop("__year")
  }

  /** Period-to-period chained Fisher volume index over (volume, price)
    * pairs, re-referenced so the base-year average = 100
    * (FAME `fishvol_rebase({v…},{p…}, year)`,
    * `fame2pygen/fame2py_converter.py:633-644`).
    */
  def fishvol(df: DataFrame, dateCol: String, volumes: Seq[String],
      prices: Seq[String], baseYear: Int, idxName: String,
      keys: Seq[String] = Nil, seed: Option[DataFrame] = None): DataFrame =
    fishvolRaw(df, dateCol, volumes, prices, baseYear, keys, seed)
      .withColumn(idxName, col("__FV_RAW") / col("__FV_BAVG") * lit(100.0))
      .drop("__FV_RAW", "__FV_BAVG")

  /** The fishvol pipeline up to (but not including) the final rebase
    * division: returns `df` plus `__FV_RAW` (the cumulative Fisher
    * product) and `__FV_BAVG` (the base-year average of `__FV_RAW`,
    * key-constant). Split out so the incremental executor can finalize
    * its carried state — the prefix product at the newest emitted row
    * and the closed base average — from the SAME plan the kernel uses.
    *
    * @param seed per-key carried state (the relaxed-fp incremental
    *   tier): `keys :+ __FV_SEED :+ __FV_SEED_DATE :+ __FV_BAVG_ST`.
    *   Rows dated ≤ the key's seed date get a null raw (they were
    *   emitted by earlier batches; the work frame holds them only as
    *   lag predecessors); the FIRST row after it folds the seed into
    *   its link — `(seed × l_f) × l_{f+1} × …` — which under the
    *   sequential native ProductAgg is the SAME multiplication sequence
    *   as the whole-history fold (bit-exact by induction; under the
    *   exp∘sum∘log fallback it re-associates — the ≤1-ulp-per-batch
    *   the relaxed tier's name concedes). The base average comes from
    *   the carried state (it finalized, in-frame and whole, the batch
    *   the base year closed); keys absent from the seed run the plain
    *   whole-history path (their entire backlog is still in frame).
    */
  def fishvolRaw(df: DataFrame, dateCol: String, volumes: Seq[String],
      prices: Seq[String], baseYear: Int, keys: Seq[String] = Nil,
      seed: Option[DataFrame] = None): DataFrame = {
    require(volumes.length == prices.length, "fishvol needs matching v/p lists")
    val w = win(keys, dateCol)
    val pairs = volumes.zip(prices)

    def dot(price: String => Column, vol: String => Column): Column =
      pairs.map { case (v, p) => price(p) * vol(v) }.reduce(_ + _)

    // qcol, not col: dotted volume/price series names read literally
    val cur  = (c: String) => qcol(c)
    val prev = (c: String) => lag(qcol(c), 1).over(w)

    val lasp = dot(prev, cur) / dot(prev, prev)
    val paas = dot(cur, cur) / dot(cur, prev)
    val lp = lasp * paas
    val link = coalesce(sqrt(when(lp > 0, lp)), lit(1.0))

    val seeded = seed match {
      case None => df
        .withColumn("__FV_SEED", lit(null).cast("double"))
        .withColumn("__FV_SEED_DATE", lit(null).cast("date"))
        .withColumn("__FV_BAVG_ST", lit(null).cast("double"))
      case Some(st) =>
        // |keys| rows (one per key) — broadcast-sized at any scale
        if (keys.isEmpty) df.crossJoin(broadcast(st))
        else df.join(broadcast(st), keys, "left")
    }
    // epoch stand-in for "no seed": every row is after it
    val sd = coalesce(col("__FV_SEED_DATE"),
      lit(java.sql.Date.valueOf("0001-01-01")))
    val prevDate = lag(col(dateCol), 1).over(w)
    val isFirst = (col(dateCol) > sd) && (prevDate.isNull || prevDate <= sd)
    val foldLink = when(col(dateCol) > sd,
      when(isFirst, coalesce(col("__FV_SEED"), lit(1.0)) * link)
        .otherwise(link))
    // materialize the link before the cumulative window — its lag() can't
    // nest inside the running product's window function
    val withRaw = seeded
      .withColumn("__fv_link", foldLink)
      .withColumn("__FV_RAW", cumprod(seeded, col("__fv_link"), w))
      .drop("__fv_link")
    val baseW =
      if (keys.isEmpty) Window.partitionBy()
      else Window.partitionBy(keys.map(col): _*)
    val baseAvg = coalesce(col("__FV_BAVG_ST"),
      avg(when(year(col(dateCol)) === baseYear, col("__FV_RAW"))).over(baseW))
    withRaw
      .withColumn("__FV_BAVG", baseAvg)
      .drop("__FV_SEED", "__FV_SEED_DATE", "__FV_BAVG_ST")
  }
}
