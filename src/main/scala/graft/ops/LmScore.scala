package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * gate: train bigram statistics on a trusted reference corpus, score
  * every candidate document by its mean negative log₂ probability per
  * token (bits/token ≈ log-perplexity). Documents unlike the reference —
  * gibberish, boilerplate, the wrong language — score high and get
  * filtered or bucketed.
  *
  * Model: add-k smoothed bigrams, P(w₂|w₁) = (c(w₁,w₂)+k) / (c(w₁)+k·V).
  * One formula covers seen and unseen pairs (counts coalesce to 0), so
  * scoring is two LEFT equi-joins against the count tables — no backoff
  * special-casing, no driver-side model object beyond the vocabulary
  * size scalar.
  *
  * Scale shape: training is two groupBys over reference bigram rows
  * (map-side partials; model size is bounded by the observed bigram
  * vocabulary, not the corpus). Scoring joins candidate bigrams on
  * (w₁,w₂) then (w₁) — key cardinality grows with vocabulary, AQE
  * broadcasts the model when it is small. Per-bigram log₂ values are
  * quantized to 4 dp BEFORE the DECIMAL sum: libm log₂ differs across
  * engines in the last ulp, and a coarse per-term grid makes a rounding
  * flip (ulp landing exactly on a half-grid boundary) practically
  * impossible — after which the sums are bit-identical, division by the
  * count is correctly rounded, and the per-doc score is partition-order
  * independent and engine-reproducible (the q57 oracle recomputes the
  * identical arithmetic).
  */
object LmScore {

  /** (id, w1, w2): consecutive-token pairs of each doc, built with the
    * tokenize-once/lead construction ([[Dedup.posGramRows]] rationale).
    */
  private def bigramRows(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "w1")))
    val win = Window.partitionBy(idCol).orderBy("pos")
    tok.withColumn("w2", lead(col("w1"), 1).over(win))
      .where(col("w2").isNotNull)
      .select(col(idCol), col("w1"), col("w2"))
  }

  /** Trained bigram statistics: pair counts, context counts, vocabulary
    * size (the one driver-side scalar — the IVF-centroid class of
    * boundary), and the smoothing constant.
    */
  final case class BigramModel(pairCounts: DataFrame, contextCounts: DataFrame,
      vocabSize: Long, k: Double)

  def trainBigram(reference: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): BigramModel = {
    val bg = bigramRows(reference, idCol, textCol)
    val pairs = bg.groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
    val ctx = pairs.groupBy("w1").agg(sum(col("__c12")).as("__c1"))
    val v = reference
      .select(explode(TextOps.tokens(col(textCol))).as("__t"))
      .agg(countDistinct(col("__t"))).head().getLong(0)
    require(v > 0, "reference corpus has no tokens — cannot train an LM " +
      "(and V = 0 would make every smoothed probability divide by zero)")
    BigramModel(pairs, ctx, v, k)
  }

  /** (idCol, n_bigrams, bits_per_token) for every candidate doc with at
    * least one bigram (docs under two tokens have no defined score and
    * are omitted). Lower = more reference-like.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      m: BigramModel): DataFrame = {
    val v = m.vocabSize.toDouble
    val lp = round(log2(
      (coalesce(col("__c12"), lit(0L)).cast("double") + m.k) /
        (coalesce(col("__c1"), lit(0L)).cast("double") + m.k * v)), 4)
    bigramRows(docs, idCol, textCol)
      .join(m.pairCounts, Seq("w1", "w2"), "left")
      .join(m.contextCounts, Seq("w1"), "left")
      .withColumn("__lp", lp)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (-(sum(col("__lp").cast(DecimalType(28, 4))).cast("double")) /
          count(lit(1))).as("bits_per_token"))
  }

  /** Interpolated Kneser-Ney bigram statistics (Chen & Goodman 1999) —
    * the smoothing family behind KenLM, i.e. the CCNet-style quality
    * scorer a real corpus pipeline runs. Beyond [[BigramModel]]'s raw
    * counts it needs the TYPE statistics: `__n1fwd` = how many distinct
    * words follow each context (the discount mass the context
    * redistributes) and `__n1rev` = how many distinct contexts precede
    * each word (the CONTINUATION count — "york" is frequent but almost
    * always follows "new", so its continuation probability is tiny;
    * that asymmetry is the entire point of KN). `bigramTypes` and
    * `vocabSize` are the two driver scalars (the model-stat class of
    * boundary, like [[BigramModel.vocabSize]]).
    */
  final case class KnModel(pairCounts: DataFrame, contextStats: DataFrame,
      contCounts: DataFrame, bigramTypes: Long, vocabSize: Long,
      discount: Double)

  def trainKneserNey(reference: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): KnModel = {
    val pairs = bigramRows(reference, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
      .localCheckpoint(true) // feeds ctx + cont + the scoring join + count
    val ctx = pairs.groupBy("w1")
      .agg(sum(col("__c12")).as("__c1"), count(lit(1)).as("__n1fwd"))
    val cont = pairs.groupBy("w2").agg(count(lit(1)).as("__n1rev"))
    val t = pairs.count()
    val v = reference
      .select(explode(TextOps.tokens(col(textCol))).as("__t"))
      .agg(countDistinct(col("__t"))).head().getLong(0)
    require(t > 0 && v > 0, "reference corpus has no bigrams/tokens - " +
      "cannot train a Kneser-Ney model")
    KnModel(pairs, ctx, cont, t, v, discount)
  }

  /** (idCol, n_bigrams, bits_per_token) under interpolated KN:
    * P(w2|w1) = max(c12−D, 0)/c1 + (D·n1fwd/c1)·Pcont(w2), with the
    * continuation distribution add-one smoothed over bigram types —
    * Pcont = (n1rev+1)/(T+V) — so unseen words keep positive mass, and
    * an unseen CONTEXT backs off to Pcont alone (interpolation weight
    * 1). Engine-portable by the q57 contract: every operand is an
    * exact integer or the exactly-representable D = 0.75, the
    * operation order is mirrored in the oracle, log2 is quantized to
    * 4 dp, and the per-doc sum runs in DECIMAL so it is
    * partition-order independent.
    */
  def scoreDocsKneserNey(docs: DataFrame, idCol: String, textCol: String,
      m: KnModel): DataFrame = {
    val d = m.discount
    val tv = (m.bigramTypes + m.vocabSize).toDouble
    val pcont = (coalesce(col("__n1rev"), lit(0L)) + lit(1L))
      .cast("double") / lit(tv)
    val c1d = col("__c1").cast("double")
    val p = when(col("__c1").isNotNull,
      greatest(coalesce(col("__c12"), lit(0L)).cast("double") - lit(d),
        lit(0.0)) / c1d
        + ((lit(d) * col("__n1fwd").cast("double")) / c1d) * pcont)
      .otherwise(pcont)
    bigramRows(docs, idCol, textCol)
      .join(m.pairCounts, Seq("w1", "w2"), "left")
      .join(m.contextStats, Seq("w1"), "left")
      .join(m.contCounts, Seq("w2"), "left")
      .withColumn("__lp", round(log2(p), 4))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (-(sum(col("__lp").cast(DecimalType(28, 4))).cast("double")) /
          count(lit(1))).as("bits_per_token"))
  }
}
