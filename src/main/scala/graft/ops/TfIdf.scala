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

  /** (idCol, token, __tf) term-frequency rows — the one tokenize →
    * explode → groupBy pass that every retrieval operator here derives
    * its document lengths, document frequencies, postings and query
    * multiplicities from. Factored out so a query chain can STAGE it
    * once (`.localCheckpoint(true)`) and fan out: Spark does not dedupe
    * common subplans, so a plan that references this frame N times
    * re-runs the scan+explode+shuffle N times — and concurrent
    * shuffle-map stages race past a lazy `.persist()` before its blocks
    * land. Eager checkpointing is the same staging trick as the q89
    * LSH index build.
    */
  def termFreqs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("__tf"))

  /** (idCol, token, w): smoothed-idf tf-idf rows, exact DECIMAL weights.
    * `nDocs` is the corpus size for the idf (pass `df.count()` or the
    * known corpus size — a scalar, the model-stat class of boundary).
    */
  def vectors(df: DataFrame, idCol: String, textCol: String, nDocs: Long,
      maxDf: Option[Long] = None): DataFrame =
    weightRows(termFreqs(df, idCol, textCol), idCol, nDocs, maxDf)

  /** [[vectors]] from a pre-staged [[termFreqs]] frame — the reuse seam
    * for chains that already hold the tf rows.
    */
  private def weightRows(tf: DataFrame, idCol: String, nDocs: Long,
      maxDf: Option[Long]): DataFrame = {
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
    // four consumers below (dl, df, postings, qtf); the sumDl scalar
    // action right after doubles as the materialization barrier, so
    // every later stage reads cached blocks — no concurrent-stage
    // cache race, the scan+explode+shuffle runs exactly once
    val tf = termFreqs(corpus, idCol, textCol).persist()
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
    // stage the tf rows FIRST (count() is the materialization barrier):
    // cv references tf twice (df branch + weight join) and the three cv
    // consumers below fan out into concurrent shuffle-map stages — a
    // lazy persist lets each racing stage re-run the scan+explode
    // before any cache block lands (the measured r10 q58 drift). With
    // tf materialized, everything downstream is cheap joins/aggs over
    // cached blocks, so cv's own persist is race-tolerant.
    val tf = termFreqs(corpus, idCol, textCol).persist()
    tf.count()
    val cv = weightRows(tf, idCol, n, maxDf).persist()
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
    tf.unpersist()
    out
  }

  /** Top-k bigram COLLOCATIONS by pointwise mutual information — the
    * corpus-statistics pass that surfaces multiword expressions ("new
    * york", "machine learning") for tokenizer-vocab and phrase-mining
    * decisions. PMI = log2(P(xy) / (P(x)·P(y))); since log is monotone,
    * ranking by the RAW likelihood ratio is ranking by PMI, and the
    * ratio stays in exact integer arithmetic: `ratio_x1e6 =
    * ⌊c_xy·N²·10⁶ / (B·c_x·c_y)⌋` over DECIMAL(38,0) products with one
    * integral divide into a long — no transcendental, so every cell
    * replays on any engine (DuckDB mirrors it in HUGEINT). `minCount`
    * is the classic support floor that kills one-off pairings.
    *
    * Scale shape: two `groupBy.count`s (map-side combined), two
    * vocab-keyed equi-joins to attach unigram counts, one broadcast of
    * the two scalar totals, and a global top-k (TakeOrdered — no full
    * sort). At web scale the DECIMAL(38) product bounds N³·10⁶ ≤ 10³⁸,
    * i.e. N ≲ 2·10¹⁰ tokens per scored slice; shard the pass by corpus
    * slice (and merge top-ks) beyond that.
    */
  def collocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    val dec = DecimalType(38, 0)
    val uni = df.select(explode(TextOps.tokens(col(textCol))).as("tok"))
    val uniCnt = uni.groupBy("tok").agg(count(lit(1)).as("c_tok"))
    val bi = Dedup.posGramRows(df, idCol, textCol, w = 2).select(col("gram"))
    // null-tolerant get(), NOT getItem: the joins below infer
    // isnotnull(w2) and Catalyst pushes that predicate through the
    // aggregate (w1/w2 are functions of the grouping key) and BELOW
    // posGramRows' completeness filter — where the last-token gram of
    // every doc still has no space and ANSI getItem(1) kills the job.
    // get() returns null there (dropped rows either way), and DuckDB's
    // list index is null-on-out-of-bounds, so the twins agree.
    val biCnt = bi.groupBy("gram").agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
      .withColumn("w1", get(split(col("gram"), " "), lit(0)))
      .withColumn("w2", get(split(col("gram"), " "), lit(1)))
    val totals = uni.agg(count(lit(1)).as("n_uni"))
      .crossJoin(bi.agg(count(lit(1)).as("n_bi")))
    biCnt
      .join(uniCnt.select(col("tok").as("w1"), col("c_tok").as("c_x")), "w1")
      .join(uniCnt.select(col("tok").as("w2"), col("c_tok").as("c_y")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("__num", col("c_xy").cast(dec) * col("n_uni").cast(dec)
        * col("n_uni").cast(dec) * lit(1000000L).cast(dec))
      .withColumn("__den", col("n_bi").cast(dec) * col("c_x").cast(dec)
        * col("c_y").cast(dec))
      .withColumn("ratio_x1e6", expr("__num DIV __den"))
      .select("gram", "c_xy", "c_x", "c_y", "ratio_x1e6")
      .orderBy(col("ratio_x1e6").desc, col("gram"))
      .limit(topK)
  }
}
