package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), per the repo's training-data-pipeline charter.
  *
  *  - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *    Join is (queries × corpus); broadcast the query side when small.
  *  - [[annTopK]] — the scale path: hyperplane-LSH buckets with multi-probe
  *    (flip one sign bit) so a query only meets its bucket's corpus rows:
  *    cost O(n/2^planes) per query instead of O(n).
  *
  * All arithmetic is `zip_with`/`aggregate` over `array<double>` — codegen'd
  * builtins, sequential fold (deterministic, oracle-reproducible), no UDFs.
  */
object Similarity {

  /** Sequential-fold dot product of two equal-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity (null on zero-norm input). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * xxhash64 of the pair mapped into [-1, 1]. No RNG state, so the same
    * bucketing reproduces on any cluster/partitioning.
    */
  private def planeCoef(plane: Int, d: Column): Column =
    (pmod(xxhash64(lit(plane), d), lit(2001L)) - 1000L).cast("double") / 1000.0

  /** Signed-hyperplane LSH bucket id from `planes` sign bits. */
  def lshBucket(vec: Column, planes: Int): Column = {
    val v = vec.cast("array<double>")
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, transform(sequence(lit(0), size(v) - 1), d => planeCoef(p, d)),
          (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact cosine top-k. `queries`/`corpus`: (idCol, vecCol) frames; result
    * (query_id, neighbor_id, cosine, rank) excluding self-matches, ties
    * broken by neighbor id for determinism.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN top-k with single-bit multi-probe: each query probes
    * its own bucket plus the `planes` buckets at hamming distance 1, then
    * ranks exact cosine within the candidate set.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      lshBucket(col(vecCol), planes).as("__b0"))
    // probe set: own bucket + one-bit flips
    val probes = qb.select(col("query_id"), col("__qv"), explode(array(
      col("__b0") +: (0 until planes).map(p =>
        col("__b0").bitwiseXOR(shiftleft(lit(1L), p))): _*)).as("bucket"))
    val scored = probes.join(c, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
