package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus drift measurement: Jensen–Shannon divergence (in bits) between
  * two corpora's hashed unigram bucket distributions — the monitoring
  * complement of [[Dedup.corpusDiff]]: diff says WHICH documents changed
  * between snapshots, divergence says how much the token DISTRIBUTION
  * moved (new domain mix, new language balance, a scraper gone wrong),
  * the number a pipeline alerts on between crawl snapshots.
  *
  * Method: tokens hash into `buckets` md5 buckets ([[Dsir.gramBucket]] —
  * the same universal arithmetic as DSIR, so any engine reproduces the
  * histogram), each corpus gets an add-1-smoothed distribution over the
  * FULL bucket domain, and JS = ½·KL(P‖M) + ½·KL(Q‖M) with M = ½(P+Q).
  * JS is symmetric and bounded in [0, 1] bit — comparable across corpus
  * pairs, unlike raw KL which is unbounded and asymmetric.
  *
  * Engine-reproducibility: every per-bucket contribution is quantized to
  * a 12dp grid and summed in DECIMAL (the LmScore/Dsir trick — the grid
  * absorbs cross-engine libm ulp noise in log₂, after which all
  * arithmetic is exact and order-independent).
  *
  * Scale shape: one explode + one ≤`buckets`-key aggregation per corpus
  * (map-side partials collapse the token stream), totals ride a 1-row
  * cross join (broadcast), and the divergence is one sum over `buckets`
  * rows. Nothing corpus-sized leaves the aggregations; no driver action
  * at all.
  */
object Divergence {

  /** One row: (n_tokens_a, n_tokens_b, js_bits). */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val spark = a.sparkSession
    def bucketCounts(df: DataFrame, as: String) =
      df.select(explode(TextOps.tokens(col(textCol))).as("__g"))
        .select(Dsir.gramBucket(col("__g"), buckets).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as(as))
    val ca = bucketCounts(a, "ca")
    val cb = bucketCounts(b, "cb")
    val totals = ca.agg(coalesce(sum("ca"), lit(0L)).as("na"))
      .crossJoin(cb.agg(coalesce(sum("cb"), lit(0L)).as("nb")))
    val domain = spark.range(buckets).select(col("id").as("__b"))
      .join(ca, Seq("__b"), "left")
      .join(cb, Seq("__b"), "left")
      .crossJoin(totals)
    val p = (coalesce(col("ca"), lit(0L)) + 1).cast("double") /
      (col("na") + buckets).cast("double")
    val q = (coalesce(col("cb"), lit(0L)) + 1).cast("double") /
      (col("nb") + buckets).cast("double")
    val m = (p + q) / 2.0
    val contrib = round((p * log2(p / m) + q * log2(q / m)) / 2.0, 12)
      .cast(DecimalType(28, 12))
    domain
      .agg(first(col("na")).as("n_tokens_a"), first(col("nb")).as("n_tokens_b"),
        sum(contrib).cast("double").as("js_bits"))
  }
}
