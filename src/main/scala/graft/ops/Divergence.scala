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

  /** Pairwise JS divergence matrix between every pair of `groupCol`
    * values — the distribution-shift complement of the KMV overlap
    * matrix (q103): overlap says how much CONTENT two sources share, JS
    * says how far apart their token DISTRIBUTIONS sit (the signal a
    * mixing/temperature decision consumes). Same quantized-grid DECIMAL
    * arithmetic as [[jsDivergence]].
    *
    * Scale shape: ONE corpus aggregation onto (#groups × buckets) keys,
    * then everything runs on the dense group×bucket frame — the pair
    * join is bounded by S²·B rows (S groups, B buckets) no matter the
    * corpus size. `groupCol` must be low-cardinality (sources, langs);
    * the dense frame is built from a range×totals cross join so empty
    * buckets smooth correctly on both sides.
    *
    * @return (g1, g2, n_tokens_1, n_tokens_2, js_bits) for g1 < g2.
    */
  def jsMatrix(df: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val spark = df.sparkSession
    val counts = df
      .select(col(groupCol).cast("string").as("__g"),
        explode(TextOps.tokens(col(textCol))).as("__t"))
      .select(col("__g"), Dsir.gramBucket(col("__t"), buckets).as("__b"))
      .groupBy("__g", "__b").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("__g").agg(sum("c").as("n"))
    // dense (group, bucket) frame: groups × buckets rows, NOT corpus rows
    val dense = spark.range(buckets).select(col("id").as("__b"))
      .crossJoin(broadcast(totals))
      .join(counts, Seq("__g", "__b"), "left")
      .select(col("__g"), col("__b"), col("n"),
        coalesce(col("c"), lit(0L)).as("c"))
      .localCheckpoint(true)
    val a = dense.select(col("__g").as("g1"), col("__b"),
      col("n").as("n1"), col("c").as("c1"))
    val b = dense.select(col("__g").as("g2"), col("__b"),
      col("n").as("n2"), col("c").as("c2"))
    val p = (col("c1") + 1).cast("double") /
      (col("n1") + buckets).cast("double")
    val q = (col("c2") + 1).cast("double") /
      (col("n2") + buckets).cast("double")
    val m = (p + q) / 2.0
    val contrib = round((p * log2(p / m) + q * log2(q / m)) / 2.0, 12)
      .cast(DecimalType(28, 12))
    a.join(b, Seq("__b")).where(col("g1") < col("g2"))
      .groupBy(col("g1"), col("g2"))
      .agg(max(col("n1")).as("n_tokens_1"),
        max(col("n2")).as("n_tokens_2"),
        sum(contrib).cast("double").as("js_bits"))
  }
}
