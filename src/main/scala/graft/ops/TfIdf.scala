package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse lexical similarity: tf-idf document vectors and inverted-index
  * cosine top-k — the term-space complement of the dense-embedding ANN
  * family ([[Similarity]]). Classic uses in a data pipeline: lexical
  * near-dup candidates, query-based corpus search, source triage.
  *
  * Scale shape: a document's sparse vector IS a long-format table
  * (id, token, weight), so similarity needs no vector type and no UDF —
  * candidates meet in ONE equi-join on the token (the inverted index),
  * partial products aggregate per pair, and a per-query window ranks.
  * The join's hot keys are stopword-like tokens; `maxDf` drops tokens in
  * more than that many documents (their idf weight is ~0 anyway), which
  * is both the relevance filter and the skew bound.
  *
  * Determinism: idf = ln((N+1)/(df+1)) + 1 is quantized to 6 dp (libm ln
  * differs across engines in the last ulp) and every weight/product/sum
  * runs in DECIMAL, so dot products and norms are exact and the final
  * cosine — computed with correctly-rounded double ops on identical
  * inputs — is bit-reproducible (the q58 oracle recomputes it).
  */
object TfIdf {

  /** (idCol, token, w): smoothed-idf tf-idf rows, exact DECIMAL weights.
    * `nDocs` is the corpus size for the idf (pass `df.count()` or the
    * known corpus size — a scalar, the model-stat class of boundary).
    */
  def vectors(df: DataFrame, idCol: String, textCol: String, nDocs: Long,
      maxDf: Option[Long] = None): DataFrame = {
    val tf = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("__tf"))
    val dft = tf.groupBy("token").agg(count(lit(1)).as("__df"))
    val kept = maxDf match {
      case None => dft
      case Some(cap) => dft.where(col("__df") <= cap)
    }
    val idf = round(log((lit(nDocs.toDouble) + 1) /
      (col("__df").cast("double") + 1)) + 1, 6).cast(DecimalType(18, 6))
    // w is declared DECIMAL(12,6): the true scale is 6 and tf·idf stays
    // far below 10⁶, so the cast is exact — and the NARROW declared type
    // is what keeps w·w at (25,12), inside the 38-digit limit, where
    // both Spark and any SQL engine compute it exactly; a wide w would
    // overflow the product's precision and each engine would round it
    // differently (observed as 1e-8 cosine flips)
    tf.join(kept, "token")
      .select(col(idCol), col("token"),
        (col("__tf").cast(DecimalType(18, 0)) * idf)
          .cast(DecimalType(12, 6)).as("w"))
  }

  /** Okapi BM25 top-k retrieval: every query doc scored against the
    * corpus through the SAME inverted-index join shape as [[topK]] —
    * score(q,d) = Σ_t qtf_t · idf(t) · (tf_td·(k1+1)) / (tf_td +
    * k1·(1−b+b·|d|/avgdl)), the Robertson/Lucene formulation with the
    * always-positive idf ln((N−df+0.5)/(df+0.5)+1).
    *
    * Determinism contract: idf is quantized to 6 dp (the one libm term);
    * k1/b default to 1.5/0.75 so every saturation constant (2.5, 0.25,
    * 0.75) is binary-exact; each per-term score is computed in
    * identically-composed correctly-rounded double arithmetic, quantized
    * to 6 dp, and summed in DECIMAL — so the q67 oracle reproduces every
    * score cell-exact. avgdl is an exact-integer-sum / count division,
    * identical in any engine.
    *
    * Scale shape: identical to [[topK]] — one token equi-join, per-pair
    * partial aggregation, per-query window; `maxDf` is the stopword/skew
    * bound. The tf table feeds four consumers (doc lengths, document
    * frequencies, postings, query multiplicities), so it is persisted
    * and released after the top-k materializes.
    */
  def bm25TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.5, b: Double = 0.75,
      maxDf: Option[Long] = None, nDocs: Option[Long] = None): DataFrame = {
    val n = nDocs.getOrElse(corpus.count())
    val tf = corpus.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("__tf"))
      .persist()
    val dl = tf.groupBy(idCol).agg(sum(col("__tf")).as("__dl"))
    // avgdl: exact long sum / exact count — one scalar job (tf is cached)
    val sumDl = dl.agg(sum(col("__dl"))).head().getLong(0)
    val avgdl = sumDl.toDouble / n.toDouble
    val dft = tf.groupBy("token").agg(count(lit(1)).as("__df"))
    val kept = maxDf match {
      case None => dft
      case Some(cap) => dft.where(col("__df") <= cap)
    }
    val idf = round(log((lit(n.toDouble) - col("__df").cast("double") + 0.5) /
      (col("__df").cast("double") + 0.5) + 1), 6).cast(DecimalType(18, 6))
    val postings = tf
      .join(kept.select(col("token"), idf.as("__idf")), "token")
      .join(dl, idCol)
      .select(col(idCol).as("neighbor_id"), col("token"),
        col("__tf"), col("__dl"), col("__idf"))
    val qtf = tf.join(queries.select(col(idCol)).distinct(), idCol)
      .select(col(idCol).as("query_id"), col("token"),
        col("__tf").as("__qtf"))
    // saturation in doubles, composed EXACTLY as the oracle writes it:
    // (tf·(k1+1)) / (tf + k1·((1−b) + b·(dl/avgdl)))
    val sat = (col("__tf").cast("double") * lit(k1 + 1.0)) /
      (col("__tf").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("__dl").cast("double") / lit(avgdl))))
    val term = round((col("__qtf").cast("double") *
      col("__idf").cast("double")) * sat, 6).cast(DecimalType(18, 6))
    val win = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    val out = qtf.join(postings, "token")
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(term).cast("double").as("score"))
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
      .localCheckpoint(true)
    tf.unpersist()
    out
  }

  /** Cosine top-k neighbors for every query doc, over the shared corpus
    * vocabulary: (query_id, neighbor_id, cosine, rank), rank 1..k,
    * ties broken by neighbor id. Query docs never match themselves.
    *
    * Pass `nDocs` when the corpus size is already known, otherwise one
    * count() job derives it. The vector table feeds three consumers
    * (query side, norms, inverted index), so it is persisted and
    * released after the (tiny) top-k result materializes — the
    * minHashLshPairs cache lifecycle.
    */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, maxDf: Option[Long] = None,
      nDocs: Option[Long] = None): DataFrame = {
    val n = nDocs.getOrElse(corpus.count())
    val cv = vectors(corpus, idCol, textCol, n, maxDf).persist()
    val qIds = queries.select(col(idCol)).distinct()
    val qv = cv.join(qIds, idCol)
      .select(col(idCol).as("query_id"), col("token"), col("w").as("__qw"))
    val norms = cv.groupBy(idCol)
      .agg(sqrt(sum(col("w") * col("w")).cast("double")).as("__n"))
    val dots = qv.join(cv.select(col(idCol).as("neighbor_id"), col("token"),
        col("w")), "token")
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("__qw") * col("w")).cast("double").as("__dot"))
    val win = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val out = dots
      .join(norms.withColumnRenamed(idCol, "query_id")
        .withColumnRenamed("__n", "__nq"), "query_id")
      .join(norms.withColumnRenamed(idCol, "neighbor_id")
        .withColumnRenamed("__n", "__nc"), "neighbor_id")
      .withColumn("cosine", col("__dot") / (col("__nq") * col("__nc")))
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .localCheckpoint(true)
    cv.unpersist()
    out
  }
}
