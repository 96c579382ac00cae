package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data Selection via Importance Resampling (DSIR) — score every raw
  * document by how target-like its hashed n-gram profile is, per the
  * published method (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"): unigram+bigram features hashed into a
  * fixed number of buckets, bag-of-words bucket distributions fitted on
  * the target and raw corpora with add-1 smoothing, and per-document
  * log importance weight `Σ_f count_f · (log₂ p_target(b_f) − log₂
  * p_raw(b_f))`. Selection then keeps the top-weight documents (or
  * Gumbel-resamples on the weights — both are a filter over this score).
  *
  * Engine-reproducibility contract (what makes the score oracle-checkable
  * and re-runs byte-stable): bucket assignment is md5-derived
  * ([[Sampling.md5Prefix32]] mod buckets — universal arithmetic, no
  * engine-specific hash), each bucket's log-ratio is quantized to 4
  * decimal places, and the per-document sum runs in DECIMAL, so the
  * result is independent of partitioning, add order, and engine.
  *
  * Scale shape (the 100 TB plan): feature extraction is an explode over
  * tokens — the same one-pass shuffle as the vocab/contamination family;
  * both corpus distributions are groupBys onto ≤ `buckets` keys
  * (map-side partial counts collapse the token stream to a bounded-size
  * aggregate); the ratio table is `buckets` rows and is BROADCAST to the
  * scoring join, so scoring itself is one exploded groupBy per document.
  * Nothing driver-side except the two corpus-size scalars (the same
  * `.item()` boundary as every scalar aggregate).
  */
object Dsir {

  /** Hashed feature id of a gram: md5-prefix mod `buckets` (non-negative;
    * md5Prefix32 is already unsigned-32 in a long).
    */
  def gramBucket(gram: Column, buckets: Int): Column =
    pmod(Sampling.md5Prefix32(gram), lit(buckets.toLong))

  /** (id, bucket) — one row per unigram + strict word bigram occurrence.
    * Multiplicity is meaningful (bag-of-words counts), so no distinct.
    */
  private def featRows(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol),
        explode(concat(TextOps.tokens(col(textCol)),
          TextOps.strictWordShingles(col(textCol), 2))).as("__gram"))
      .select(col(idCol), gramBucket(col("__gram"), buckets).as("__b"))

  /** Per-bucket occurrence counts over a whole corpus: `buckets`-row
    * frame (__b, n). Missing buckets are absent (coalesced to 0 later).
    */
  private def bucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    featRows(df, idCol, textCol, buckets)
      .groupBy("__b").agg(count(lit(1)).as("n"))

  /** Score `raw`'s documents against `target`'s feature distribution.
    *
    * Returns (idCol, n_feats, log_weight): feature count and the
    * 4dp-quantized DECIMAL-summed log₂ importance weight (cast to double
    * at the end — every addend is exact in DECIMAL(18,4), so the sum is
    * order-independent). Documents with no features get no row (a doc
    * with zero grams has weight 0 by definition and nothing to score).
    *
    * @param buckets hash-feature dimensionality (DSIR uses 10⁴; anything
    *                ≥ a few thousand keeps collisions immaterial). The
    *                ratio table materialized on the driver is `buckets`
    *                rows — bounded and broadcast, never corpus-sized.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = raw.sparkSession

    val tc = bucketCounts(target, idCol, textCol, buckets)
    val rc = bucketCounts(raw, idCol, textCol, buckets)
    // two corpus-total scalars — the one inherent driver boundary
    val nT = tc.agg(sum(col("n"))).head().getLong(0)
    val nR = rc.agg(sum(col("n"))).head().getLong(0)

    // full bucket domain so unseen buckets still get the smoothed default
    // ratio; `buckets` rows, broadcast into the scoring join
    val ratio = spark.range(buckets).select(col("id").as("__b"))
      .join(tc.withColumnRenamed("n", "nt"), Seq("__b"), "left")
      .join(rc.withColumnRenamed("n", "nr"), Seq("__b"), "left")
      .select(col("__b"),
        // each log₂ is quantized to 4dp SEPARATELY before the difference —
        // the LmScore trick: a coarse per-term grid absorbs cross-engine
        // libm ulp differences, after which all arithmetic is exact
        (round(log2((coalesce(col("nt"), lit(0L)) + 1).cast("double") /
            lit((nT + buckets).toDouble)), 4).cast(DecimalType(18, 4)) -
         round(log2((coalesce(col("nr"), lit(0L)) + 1).cast("double") /
            lit((nR + buckets).toDouble)), 4).cast(DecimalType(18, 4)))
          .as("__lr"))

    featRows(raw, idCol, textCol, buckets)
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .join(broadcast(ratio), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_feats"),
        sum(col("__c").cast(DecimalType(10, 0)) * col("__lr"))
          .cast("double").as("log_weight"))
  }

  /** Deterministic top-fraction selection on the weights: keep the
    * documents whose log-weight clears `minLogWeight`. (A quantile-derived
    * threshold is one `percentile_approx` away; the comparison itself is
    * the reproducible part.)
    */
  def select(weights: DataFrame, minLogWeight: Double): DataFrame =
    weights.where(col("log_weight") >= minLogWeight)
}
