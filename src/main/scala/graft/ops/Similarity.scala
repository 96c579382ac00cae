package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Sequential-fold dot product of two equal-length numeric arrays.
    * Uses the native fused [[graft.plans.DotProduct]] expression when the
    * session has `GraftExtensions` (one multiply-add loop in codegen, no
    * intermediate array); falls back to the builtin zip_with/aggregate
    * spelling otherwise. Both are the same left-to-right fold, so results
    * are bit-identical either way.
    */
  def dot(a: Column, b: Column): Column =
    if (hasNativeDot)
      call_function("dot_product", a, b)
    else
      aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def hasNativeDot: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.catalog.functionExists("dot_product"))

  /** Cosine similarity (null on zero-norm input). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic pseudo-random hyperplane coefficients (planes × dim),
    * computed ONCE on the driver: splitmix64 of (plane, dim) mapped into
    * [-1, 1]. No RNG state, so the same bucketing reproduces on any
    * cluster/partitioning — and, embedded as array literals, the per-row
    * cost is one codegen'd zip_with per plane instead of planes × dim
    * hash evaluations per row (the latter multiplied every scan and was
    * the round-2 bench regression on the LSH queries).
    */
  def planeCoefs(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      var z = (p.toLong << 32) + d + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }

  /** Signed-hyperplane LSH bucket id: bit p = sign of ⟨vec, coefs(p)⟩.
    * `coefs` comes from [[planeCoefs]] — plane count is `coefs.length`.
    */
  def lshBucket(vec: Column, coefs: Array[Array[Double]]): Column = {
    val v = vec.cast("array<double>")
    val bits = coefs.zipWithIndex.map { case (cs, p) =>
      when(dot(v, lit(cs)) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Vector dimensionality from the first row — one tiny driver action,
    * the same boundary every index build has (cf. IVF centroids).
    */
  def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

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

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions:
    * y_j = ⟨x, R_j⟩ / √outDim with R from [[planeCoefs]] — deterministic
    * splitmix coefficients, no RNG state, so the same projection
    * reproduces on any cluster/partitioning/engine (the matrix embeds
    * as array literals, one codegen'd zip_with per output dim). The
    * dimensionality lever for the embedding pipeline: 64→8 dims is 8×
    * less data through every downstream join/scan; compose with
    * [[quantizeInt8]] for the full compression story, and with the
    * ANN family (bucket on the originals, score on the projections, or
    * vice versa). Pure per-row projection — no shuffle.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int): DataFrame = {
    require(outDim > 0, "outDim must be positive")
    val dim = vecDim(df, vecCol)
    val coefs = planeCoefs(outDim, dim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol),
      array(coefs.toSeq.map(row => dot(v, lit(row)) * scale): _*)
        .as("projected"))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x| / 127, codes
    * = round(x / scale) ∈ [-127, 127]. 4× smaller than float32 at rest
    * (the storage/IO lever for a 100-TB embedding corpus) and EXACT to
    * reason about: cosine over the dequantized vectors equals the
    * integer-arithmetic cosine of the codes (the per-vector scales
    * cancel), so ranking quality degrades only by the rounding itself.
    * Adds (`scale` double, `codes` array<int>); an all-zero vector gets
    * scale 0 and all-zero codes. Pure per-row projection — no shuffle.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("scale",
        aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0)
      .withColumn("codes",
        when(col("scale") === 0.0, transform(v, _ => lit(0)))
          .otherwise(transform(v, x => round(x / col("scale")).cast("int"))))
      .select(col(idCol), col("scale"), col("codes"))
  }

  /** Exact-integer dot of two int-code arrays (long accumulation — no
    * overflow below ~5·10¹⁴ dims at |code| ≤ 127, and bit-reproducible
    * on any engine, unlike a float fold).
    */
  def codeDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Brute-force cosine top-k over int8-quantized vectors: quantize both
    * sides with [[quantizeInt8]], rank by the integer-code cosine (==
    * dequantized cosine; scales cancel). Same broadcast-query shape as
    * [[bruteForceTopK]] but the corpus side streams 4×-smaller codes and
    * the hot loop is integer multiply-add. The LSH/IVF candidate
    * generators compose unchanged on top (bucket on the original floats,
    * score on codes).
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = quantizeInt8(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("codes").as("__qc"))
    val c = quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes").as("__cc"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        codeDot(col("__qc"), col("__cc")).cast("double") /
          (sqrt(codeDot(col("__qc"), col("__qc")).cast("double")) *
            sqrt(codeDot(col("__cc"), col("__cc")).cast("double"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Fixed-point grid for the k-means family: vector coordinates are
    * rounded to `round(x · 10⁶)` longs, centroids live on the same grid,
    * and every distance is an exact integer sum — so the whole Lloyd
    * loop is order-free (no fp associativity anywhere) and replays
    * bit-identically on any engine, including the DuckDB oracle.
    * Magnitude bound: |coord| ≤ G·maxAbs, so a 64-dim squared distance
    * stays ≤ 64·(2G·maxAbs)² ≈ 10¹⁵ < 2⁵³ for maxAbs ≤ 2 — exact in a
    * long and even in a double. Centroid sums stay exact up to ~10⁹ rows
    * per cluster at maxAbs ≤ 1 (2·Σ|x| < 2⁵³).
    */
  val KmeansGrid: Long = 1000000L

  /** Vector quantized onto the k-means grid. */
  def toGrid(v: Column): Column =
    transform(v.cast("array<double>"),
      x => round(x * KmeansGrid).cast("long"))

  /** Exact integer squared L2 distance from grid vector `q` to a grid
    * centroid literal.
    */
  private def gridDist2(q: Column, centroid: Array[Long]): Column =
    aggregate(zip_with(q, lit(centroid), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, x) => acc + x)

  /** Nearest-centroid assignment of a `(id, __v, __q)` frame: exact
    * integer argmin with first-index tie-break, as one mapPartitions
    * pass over broadcast centroid arrays (the per-partition-imperative
    * exemption — pure long arithmetic, bit-identical to the
    * [[gridDist2]]/array_position Column spelling it replaces, which
    * evaluated nlist interpreted higher-order chains per row and was
    * the dominant cost of the Lloyd loop at ~1.4 ms/vector).
    */
  private def assignOnGrid(base: DataFrame,
      centroids: Seq[Array[Long]]): DataFrame = {
    val cents = centroids.toArray
    val s = base.schema
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      s.fields(0), s.fields(1),
      org.apache.spark.sql.types.StructField("__c",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      s.fields(2)))
    base.mapPartitions { it =>
      it.map { r =>
        val q = r.getSeq[Long](2)
        var best = 0; var bestD = Long.MaxValue
        var c = 0
        while (c < cents.length) {
          val cent = cents(c); var d = 0L; var i = 0
          while (i < cent.length) {
            val t = q(i) - cent(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        org.apache.spark.sql.Row(r.get(0), r.get(1), best, r.get(2))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema)).toDF()
  }

  /** Deterministic hash-seeded Lloyd k-means over an embedding column:
    * init buckets by id hash (md5-prefix32 — no RNG state AND
    * engine-free, so the same clustering reproduces on any
    * cluster/partitioning/rerun/engine), then `iters` refinements on the
    * [[KmeansGrid]] integer grid. Returns the final assignment frame
    * (idCol, `__v` array<double>, cluster `__c`, `__q` grid vector) and
    * the learned GRID centroids (divide by [[KmeansGrid]] for real
    * coordinates).
    *
    * The centroid update is an exact long sum + round-half-up division
    * (`floor((2s+n)/(2n))` — both operands exact, one correctly-rounded
    * IEEE division, so identical on every engine); assignment is an
    * integer argmin with first-index tie-break. No floating-point value
    * enters the iteration, which is what lets q35/q61 replay cell-exact
    * in DuckDB (fp `avg` order was the round-7 blocker).
    *
    * Centroids are driver-sized by construction (nlist × dim longs —
    * the boundary every IVF/k-means index has); everything else is
    * distributed: assignment is a per-row argmin over broadcast centroid
    * literals, the centroid update is a (cluster, dim) groupBy.
    * Shared by [[ivfTopK]] (probe lists) and
    * [[Dedup.semanticDedupPairs]] (SemDeDup clusters).
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): (DataFrame, Seq[Array[Long]]) = {
    require(iters >= 1, "k-means needs at least one Lloyd iteration")
    val v = col(vecCol).cast("array<double>")
    // each iteration's assignment is persisted (id+vec+bucket, tiny) so the
    // next centroid aggregation doesn't lazily re-execute the prior chain
    val base = corpus.select(col(idCol), v.as("__v"), toGrid(v).as("__q"))
    var assigned = base.select(col(idCol), col("__v"),
      pmod(Sampling.md5Prefix32(col(idCol)), lit(nlist.toLong)).cast("int")
        .as("__c"),
      col("__q"))
      .persist()
    var centroids: Seq[Array[Long]] = Nil
    (0 until iters).foreach { it =>
      val cents = assigned
        .select(col("__c"), posexplode(col("__q")).as(Seq("__d", "__x")))
        .groupBy("__c", "__d")
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        // round-half-up of s/n without fp state: 2s+n and 2n are exact
        // longs, their double quotient is one correctly-rounded division
        .select(col("__c"), col("__d"),
          floor((col("__s") * 2 + col("__n")).cast("double") /
            (col("__n") * 2).cast("double")).cast("long").as("__m"))
        .groupBy("__c").agg(array_sort(collect_list(struct(col("__d"), col("__m"))))
          .as("__ms"))
        .select(col("__c"), transform(col("__ms"), s => s.getField("__m")).as("__cent"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
      val dim = cents.values.headOption.map(_.length).getOrElse(0)
      centroids = (0 until nlist).map(i =>
        cents.getOrElse(i, Array.fill(dim)(0L)))
      val prev = assigned
      assigned = assignOnGrid(base, centroids)
      // only persist assignments that feed another Lloyd collect; the last
      // one is consumed by the caller, whose consumption pattern decides
      // its own caching
      if (it < iters - 1) assigned = assigned.persist()
      prev.unpersist()
    }
    (assigned, centroids)
  }

  /** Coarse IVF index: the corpus assigned to its nearest trained
    * centroid, plus the centroid arrays — built ONCE per (corpus,
    * nlist, iters) and probed at any nprobe via [[ivfProbe]]. The
    * assignment frame is staged EAGERLY (localCheckpoint): training is
    * the expensive step (iters Lloyd rounds over the whole corpus), and
    * without staging every downstream probe lazily re-executes it — the
    * r10 q127 shape, which trained the same index three times for three
    * nprobe points. This is the in-query twin of the q89 persisted
    * nightly index: same build, the physical parquet write swapped for
    * an in-memory checkpoint.
    */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, iters: Int = 2): (DataFrame, Seq[Array[Long]]) = {
    val (assigned, centroids) =
      kmeansAssign(corpus, idCol, vecCol, nlist, iters)
    (assigned.localCheckpoint(true), centroids)
  }

  /** IVF-style ANN top-k: [[kmeansAssign]] centroids, corpus assigned to
    * its nearest centroid, each query probing the `nprobe` nearest
    * centroid lists. One-shot form; sweeps over nprobe should build
    * [[ivfIndex]] once and call [[ivfProbe]] per point.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, iters: Int = 2,
      nprobe: Int = 2): DataFrame = {
    val (assigned, centroids) =
      kmeansAssign(corpus, idCol, vecCol, nlist, iters)
    ivfProbe(queries, assigned, centroids, idCol, vecCol, k, nprobe)
  }

  /** Probe step of [[ivfTopK]] over a pre-built [[ivfIndex]]. */
  def ivfProbe(queries: DataFrame, assigned: DataFrame,
      centroids: Seq[Array[Long]], idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val c = assigned.select(col(idCol).as("neighbor_id"),
      col("__v").as("__cv"), col("__c").as("bucket"))
    // query probes: indices of the nprobe nearest centroids by exact
    // integer grid distance (ties by index — array_sort on the struct is
    // lexicographic), same arithmetic the oracle replays
    def probeArr(qGrid: Column): Column = slice(
      transform(
        array_sort(array(centroids.zipWithIndex.map { case (cent, i) =>
          struct(gridDist2(qGrid, cent).as("d"), lit(i).as("i"))
        }: _*)),
        s => s.getField("i")),
      1, nprobe)
    val q = queries.select(col(idCol).as("query_id"), v.as("__qv"),
      explode(probeArr(toGrid(v))).as("bucket"))
    val scored = q.join(c, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
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
    val coefs = planeCoefs(planes, vecDim(corpus, vecCol))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), coefs).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      lshBucket(col(vecCol), coefs).as("__b0"))
    // probe set: own bucket + one-bit flips
    val probes = qb.select(col("query_id"), col("__qv"), explode(array(
      col("__b0") +: (0 until planes).map(p =>
        col("__b0").bitwiseXOR(shiftleft(lit(1L), p))): _*)).as("bucket"))
    // a (query, neighbor) pair can meet in several probe buckets; dedup
    // groups on the two ids only — cosine is identical per pair, so it
    // rides along as first() instead of widening the shuffle key the way
    // a distinct over (ids, double) would
    val scored = probes.join(c, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
      .groupBy("query_id", "neighbor_id")
      .agg(first(col("cosine")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Maximum-inner-product search (MIPS) via the norm-augmentation
    * reduction (Bachrach et al., RecSys 2014; Shrivastava & Li, NIPS
    * 2014): items gain a coordinate x' = [x ; √(M² − |x|²)] with M the
    * max item norm, queries q' = [q ; 0]. Then ⟨q', x'⟩ = ⟨q, x⟩ and
    * |x'| = M for every item, so inner-product ranking becomes cosine
    * ranking on the augmented space and the signed-hyperplane LSH
    * machinery ([[annTopK]]) applies to a problem raw cosine-LSH can't
    * serve — the retrieval shape of recommender scoring and un-
    * normalized embedding search. The 1/M normalization is dropped on
    * purpose: sign-LSH is scale-invariant, and the unscaled form
    * replays in SQL without a division per coordinate.
    *
    * Buckets on the augmented (dim+1)-space with one-bit multi-probe;
    * candidates re-rank by the EXACT raw inner product. M² is one max
    * aggregate (order-independent over doubles — oracle-replayable),
    * the same driver boundary as [[vecDim]].
    *
    * @return (query_id, neighbor_id, dot, rank) — top `k` by inner
    *         product among probed candidates, self-matches excluded,
    *         ties broken by neighbor id.
    */
  def mipsTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // empty-corpus guard (module convention, same as pcaTopComponent):
    // max over zero rows is a null cell, and vecDim's head() would throw
    val m2Cell = corpus.agg(max(dot(v, v))).head().getAs[Any](0)
    if (m2Cell == null) {
      val s = corpus.sparkSession
      import org.apache.spark.sql.types._
      // id field types derive from the input schemas (a string-keyed
      // corpus must yield string-typed empty columns, not hardcoded
      // longs — the r11 advice nit)
      val qIdType = queries.schema(idCol).dataType
      val cIdType = corpus.schema(idCol).dataType
      return s.createDataFrame(s.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField("query_id", qIdType), StructField("neighbor_id", cIdType),
        StructField("dot", DoubleType), StructField("rank", IntegerType))))
    }
    val m2 = m2Cell.asInstanceOf[Double]
    val dim = vecDim(corpus, vecCol)
    val coefs = planeCoefs(planes, dim + 1)
    val itemAug = concat(v,
      array(sqrt(greatest(lit(m2) - dot(v, v), lit(0.0)))))
    val queryAug = concat(v, array(lit(0.0)))
    val c = corpus.select(col(idCol).as("neighbor_id"), v.as("__cv"),
      lshBucket(itemAug, coefs).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), v.as("__qv"),
      lshBucket(queryAug, coefs).as("__b0"))
    val probes = qb.select(col("query_id"), col("__qv"), explode(array(
      col("__b0") +: (0 until planes).map(p =>
        col("__b0").bitwiseXOR(shiftleft(lit(1L), p))): _*)).as("bucket"))
    val scored = probes.join(c, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("__qv"), col("__cv")).as("dot"))
      .groupBy("query_id", "neighbor_id")
      .agg(first(col("dot")).as("dot"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "dot", "rank")
  }

  /** Product-Quantization codebooks + codes (Jegou, Douze, Schmid,
    * TPAMI 2011) — the memory path of planet-scale ANN (FAISS's
    * IVF-PQ): the `dim`-vector splits into `m` subvectors, each
    * subspace learns its own `ksub`-centroid codebook
    * ([[kmeansAssign]], so the training is the same hash-seeded
    * integer-grid Lloyd that made q35/q61 oracle-replayable), and a
    * vector stores only its m sub-codes — packed here into ONE long
    * (m·log2(ksub) = 32 bits at the 8×16 default): 4 bytes per vector
    * where the raw embedding is 256. Returns the per-id code columns
    * (`__c0`…`__c{m-1}` + packed `code`) and the m codebooks (grid
    * longs, driver-sized by construction like every ANN codebook).
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, iters: Int = 2,
      preGrid: Boolean = false): (DataFrame, Seq[Seq[Array[Long]]]) = {
    val dim = vecDim(corpus, vecCol)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val v = col(vecCol).cast("array<double>")
    // ALL m subspaces train in ONE Lloyd loop keyed by (subspace,
    // cluster): the exploded (id, j, subvector) frame aggregates every
    // codebook's centroid update in a single groupBy and collects one
    // m×ksub×sub result per iteration — `iters` driver round-trips
    // total, not m×iters sequential barriers (the difference between 2
    // and 16 synchronization points per training run; at cluster scale
    // the barriers are the cost, not the arithmetic). Per-(j, c) math
    // is identical to running kmeansAssign per subspace — same init
    // hash, same exact-integer centroid rounding, same first-index
    // argmin — which is what the q109 oracle replays.
    // preGrid: the vector is ALREADY integer-grid longs (e.g. IVF
    // residuals) — slice without re-quantizing
    def sv(j: Int): Column =
      if (preGrid) slice(col(vecCol), j * sub + 1, sub)
      else toGrid(slice(v, j * sub + 1, sub))
    val base = corpus.select(col(idCol), explode(array((0 until m).map(j =>
        struct(lit(j).as("j"), sv(j).as("sv"))): _*)).as("s"))
      .select(col(idCol), col("s.j").as("__j"), col("s.sv").as("__q"))
    var assigned = base.withColumn("__c",
      pmod(Sampling.md5Prefix32(col(idCol)), lit(ksub.toLong)).cast("int"))
      .persist()
    var books: Seq[Seq[Array[Long]]] = Nil
    (0 until iters).foreach { it =>
      val cents = assigned
        .select(col("__j"), col("__c"),
          posexplode(col("__q")).as(Seq("__d", "__x")))
        .groupBy("__j", "__c", "__d")
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .select(col("__j"), col("__c"), col("__d"),
          floor((col("__s") * 2 + col("__n")).cast("double") /
            (col("__n") * 2).cast("double")).cast("long").as("__m"))
        .collect()
      books = (0 until m).map { j =>
        (0 until ksub).map { c =>
          val arr = Array.fill(sub)(0L)
          cents.iterator
            .filter(r => r.getInt(0) == j && r.getInt(1) == c)
            .foreach(r => arr(r.getInt(2)) = r.getLong(3))
          arr
        }
      }
      val prev = assigned
      assigned = assignSubspaces(base, books)
      if (it < iters - 1) assigned = assigned.persist()
      prev.unpersist()
    }
    val aggCols = (0 until m).map(j =>
      max(when(col("__j") === j, col("__c"))).as(s"__c$j"))
    val codes = assigned.groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
    val packed = (0 until m)
      .map(j => col(s"__c$j").cast("long") * lit(math.pow(ksub, j).toLong))
      .reduce(_ + _)
    (codes.withColumn("code", packed).localCheckpoint(true), books)
  }

  /** Nearest-centroid assignment of the exploded (id, __j, __q) frame
    * against per-subspace codebooks — [[kmeansAssign]]'s argmin
    * mapPartitions, with the codebook picked by the row's subspace.
    */
  private def assignSubspaces(base: DataFrame,
      books: Seq[Seq[Array[Long]]]): DataFrame = {
    val cents = books.map(_.toArray).toArray
    val s = base.schema
    val outSchema = org.apache.spark.sql.types.StructType(
      s.fields.toIndexedSeq :+ org.apache.spark.sql.types.StructField("__c",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    base.mapPartitions { it =>
      it.map { r =>
        val j = r.getInt(1)
        val q = r.getSeq[Long](2)
        val book = cents(j)
        var best = 0; var bestD = Long.MaxValue
        var c = 0
        while (c < book.length) {
          val cent = book(c); var d = 0L; var i = 0
          while (i < cent.length) {
            val t = q(i) - cent(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), best)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema)).toDF()
  }

  /** PQ top-k by asymmetric distance computation (ADC): each query
    * builds an m×ksub lookup table of EXACT integer grid distances
    * from its subvectors to every codebook centroid (driver arithmetic
    * on the collected query set — the broadcast-by-definition small
    * side, exactly [[bruteForceTopK]]'s contract), and every corpus
    * vector's distance estimate is m table lookups summed — no
    * embedding is ever read at query time, only the 4-byte codes.
    * Ranking ties break on cand_id. Everything is exact long
    * arithmetic end to end, so the DuckDB oracle replays every
    * estimate, rank, and the recall witness cell-for-cell.
    *
    * Returns (query_id, cand_id, rank, est_d2, true_d2, in_exact_topk):
    * true grid distance and exact-top-k membership ride along so PQ's
    * accuracy loss is measured next to its 64× memory win — at corpus
    * scale the witness columns are the expensive luxury you drop.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): DataFrame =
    pqServe(queries, corpus, idCol, vecCol, k, m, ksub, iters)
      .join(gridWitness(queries, corpus, idCol, vecCol),
        Seq("query_id", "cand_id"))
      .withColumn("in_exact_topk", col("true_rank") <= k)
      .select("query_id", "cand_id", "rank", "est_d2", "true_d2",
        "in_exact_topk")

  /** Per-query ADC lookup table, computed IN-PLAN: entry [j][c] is the
    * exact long squared distance from the query's j-th grid subvector
    * to codebook centroid c — so no query vector ever reaches the
    * driver (r19; the VERDICT-r18 "LUT build is the last driver data
    * path on serve" item). Uses the native [[graft.plans.AdcLut]]
    * expression when the session has GraftExtensions (one multiply-add
    * loop; the builtin higher-order-function spelling below measured
    * ~2.6 ms/row interpreted — 26 s of the 10⁴-query serve probe).
    * Both spellings are the same exact long arithmetic the DuckDB
    * oracle replays.
    */
  private def adcLut(books: Seq[Seq[Array[Long]]], qg: Column,
      sub: Int): Column = {
    val booksLit = typedlit(books.map(_.map(_.toSeq)))
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.catalog.functionExists("adc_lut")))
      call_function("adc_lut", qg, booksLit)
    else
      transform(booksLit, (book, j) =>
        transform(book, cent =>
          aggregate(
            zip_with(slice(qg, j * lit(sub) + lit(1), lit(sub)), cent,
              (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, x) => acc + x)))
  }

  /** The serve path alone — (query_id, cand_id, rank, est_d2) without the
    * exact-grid witness columns. This is what runs at eval-set scale: the
    * witness join re-reads every raw vector per query (the cost the codes
    * exist to avoid), so [[pqTopK]]'s extra columns are a small-fixture
    * luxury and the ScaleProbe arm measures THIS method.
    */
  def pqServe(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    val (codes, books) = pqTrain(corpus, idCol, vecCol, m, ksub, iters)
    val dim = vecDim(corpus, vecCol)
    val sub = dim / m
    val v = col(vecCol).cast("array<double>")
    // serve via ONE broadcast-LUT join, not per-query plan branches: the
    // r17 shape folded a `codes.select` per query row with unionByName,
    // so the PLAN grew linearly in |queries| (fan-out at 10⁴ queries).
    // Here the per-query m×ksub tables ship as a small DataFrame —
    // |queries| rows × m·ksub longs, broadcast by construction — and one
    // flat crossJoin scores every (query, code) pair: plan size is
    // constant, serve cost linear, and the arithmetic is the same exact
    // long LUT lookups (element_at over the broadcast nested array).
    // r19: the LUTs build IN-PLAN — `transform` over the codebook
    // LITERAL (m×ksub×sub grid longs, driver-sized like every codebook)
    // against each query's grid vector — so serve has no driver data
    // path at all (the r18 shape still collect()ed the query vectors to
    // compute the LUTs driver-side: a memory/CPU bottleneck at ≥10⁶
    // queries). slice/zip_with/aggregate replay the exact same long
    // subvector squared distances, so the oracle is unchanged.
    val lutDf = queries
      .select(col(idCol).as("query_id"), toGrid(v).as("__qg"))
      .select(col("query_id"),
        adcLut(books, col("__qg"), sub).as("__lut"))
    // join orientation (r19): STREAM the query/LUT side, BROADCAST the
    // codes — codes are the 64×-compressed side by design (4 B/vector;
    // a corpus whose codes outgrow broadcast belongs on [[ivfPqServe]]'s
    // list-routed join), and streaming the queries co-locates every
    // candidate of a query in ONE partition, so the pre-shuffle partial
    // top-k (WindowGroupLimit) prunes the nq×|codes| scored pairs down
    // to nq×k rows before the rank exchange. The r18 orientation
    // (broadcast-LUT, stream codes) scattered each query's candidates
    // across all partitions — the partial prune kept ~k per partition
    // per query, so the shuffle stayed O(nq×partitions×k) and the sort
    // spilled at 10⁵ queries (6.5 GB memory spill, 13.6× wall per 10×).
    val est = lutDf.crossJoin(broadcast(
        codes.select(col(idCol) +: (0 until m).map(j => col(s"__c$j")): _*)))
      .select(col("query_id"), col(idCol).as("cand_id"),
        (0 until m).map(j =>
          element_at(element_at(col("__lut"), j + 1), col(s"__c$j") + 1))
          .reduce(_ + _).as("est_d2"))
    val wEst = Window.partitionBy("query_id")
      .orderBy(col("est_d2").asc, col("cand_id").asc)
    est.where(col("query_id") =!= col("cand_id"))
      .withColumn("rank", row_number().over(wEst))
      .where(col("rank") <= k)
  }

  /** Exact-grid witness frame (query_id, cand_id, true_d2, true_rank):
    * true integer grid distances + the exact global ranking — what the
    * ADC estimates are measured against. A corpus-scale luxury by
    * construction (it reads the raw vectors the codes exist to avoid).
    */
  private def gridWitness(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val qg = queries.select(col(idCol).as("query_id"), toGrid(v).as("__qg"))
    val cg = corpus.select(col(idCol).as("cand_id"), toGrid(v).as("__cg"))
    val wTrue = Window.partitionBy("query_id")
      .orderBy(col("true_d2").asc, col("cand_id").asc)
    qg.join(cg, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        aggregate(zip_with(col("__qg"), col("__cg"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
          .as("true_d2"))
      .withColumn("true_rank", row_number().over(wTrue))
  }

  /** IVF-PQ with residual encoding — the composition FAISS ships as its
    * default billion-scale index: a coarse [[kmeansAssign]] partitions
    * the corpus into `nlist` inverted lists, each vector PQ-encodes its
    * RESIDUAL from its list centroid (residuals are tighter than raw
    * vectors, so the same ksub centroids quantize them with less
    * error), and a query probes only the `nprobe` nearest lists,
    * ranking their members by residual-ADC lookups. Memory per vector:
    * one list id + the 4-byte PQ code; query cost: nprobe/nlist of the
    * corpus, never the raw embeddings. Residuals are exact long
    * subtractions on the grid and the sub-quantizers train through
    * [[pqTrain]]'s preGrid path, so the entire index — coarse lists,
    * residual codebooks, codes, estimates, ranks — replays cell-exact
    * in the oracle. Witness columns measure end-to-end recall INCLUDING
    * probe misses (a neighbor in an unprobed list is simply absent).
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, nlist: Int = 16, coarseIters: Int = 2,
      m: Int = 8, ksub: Int = 16, pqIters: Int = 2, nprobe: Int = 2)
      : DataFrame =
    ivfPqServe(queries, corpus, idCol, vecCol, k, nlist, coarseIters, m,
        ksub, pqIters, nprobe)
      .join(gridWitness(queries, corpus, idCol, vecCol),
        Seq("query_id", "cand_id"))
      .withColumn("in_exact_topk", col("true_rank") <= k)
      .select("query_id", "cand_id", "rank", "est_d2", "true_d2",
        "in_exact_topk")

  /** Serve-only IVF-PQ — see [[pqServe]] for why the witness columns are
    * split out of the scale path.
    */
  def ivfPqServe(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, nlist: Int = 16, coarseIters: Int = 2,
      m: Int = 8, ksub: Int = 16, pqIters: Int = 2, nprobe: Int = 2)
      : DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val (assigned, coarse) =
      kmeansAssign(corpus, idCol, vecCol, nlist, coarseIters)
    val centLit = typedlit(coarse.map(_.toSeq))
    val resid = assigned.select(col(idCol), col("__c").as("list_id"),
      zip_with(col("__q"), element_at(centLit, col("__c") + 1),
        (x, c) => x - c).as("__r"))
      .localCheckpoint(true)
    val (codes, books) =
      pqTrain(resid, idCol, "__r", m, ksub, pqIters, preGrid = true)
    val coded = codes.join(resid.select(col(idCol), col("list_id")),
      Seq(idCol)).localCheckpoint(true)
    val dim = coarse.headOption.map(_.length).getOrElse(0)
    val sub = dim / m
    // same broadcast-LUT shape as [[pqTopK]] (r17 plan fan-out fix), with
    // probe routing folded into the join key: one LUT row per
    // (query, probed list) — |queries|·nprobe rows — equi-joined on
    // list_id, so only probed lists' codes are scored and the plan stays
    // one join regardless of |queries|.
    // r19, like [[pqServe]]: routing AND residual LUTs build IN-PLAN.
    // array_sort on (d, list) structs ranks the coarse centroids with
    // the same (distance, index) tie-break the driver `.sorted` used;
    // slice keeps nprobe, explode yields the (query, probed list) rows,
    // and each row's residual (query − list centroid, exact long
    // subtraction) feeds [[adcLut]]. No query vector reaches the driver.
    // coarse ranking reuses [[adcLut]] with the coarse centroids as a
    // single-subspace codebook (1×nlist×dim): one native loop yields the
    // query's exact distance to every list centroid
    val coarseDists = element_at(adcLut(Seq(coarse), col("__qg"), dim), 1)
    val probes = slice(array_sort(transform(coarseDists, (d, i) =>
      struct(d.as("d"), i.as("i")))), 1, nprobe)
    val lutDf = queries
      .select(col(idCol).as("query_id"), toGrid(v).as("__qg"))
      .select(col("query_id"), col("__qg"), explode(probes).as("__p"))
      .select(col("query_id"),
        col("__p").getField("i").as("list_id"),
        zip_with(col("__qg"),
          element_at(centLit, col("__p").getField("i") + 1),
          (x, c) => x - c).as("__rq"))
      .select(col("query_id"), col("list_id"),
        adcLut(books, col("__rq"), sub).as("__lut"))
    val est = coded.join(broadcast(lutDf), Seq("list_id"))
      .select(col("query_id"), col(idCol).as("cand_id"),
        (0 until m).map(j =>
          element_at(element_at(col("__lut"), j + 1), col(s"__c$j") + 1))
          .reduce(_ + _).as("est_d2"))
    val wEst = Window.partitionBy("query_id")
      .orderBy(col("est_d2").asc, col("cand_id").asc)
    est.where(col("query_id") =!= col("cand_id"))
      .withColumn("rank", row_number().over(wEst))
      .where(col("rank") <= k)
  }

  /** Top principal component of the embedding corpus by power iteration
    * — the "is there one dominant axis?" diagnostic that decides
    * whether embeddings need whitening before cosine retrieval (a
    * single rogue direction — an encoder artifact, a length signal —
    * dominates every dot product and flattens ANN recall).
    *
    * Exactness: vectors land on the [[KmeansGrid]] integer grid and the
    * UNNORMALIZED scatter matrix S = n·Σqqᵀ − (Σq)(Σq)ᵀ is assembled in
    * DECIMAL(38,0) (no mean division, so S is exact; same direction as
    * the covariance). Iteration: v₀ = 1⃗·G; repeat v ← ⌊(S·v)·G /
    * max|S·v|⌋ `iters` times (truncating division, the `//` DuckDB
    * twin); λ̂ = ⌊vᵀSv / vᵀv⌋. Every step is integer arithmetic an
    * oracle replays bit-for-bit as unrolled CTEs.
    *
    * Scale shape: the outer-product partials accumulate INSIDE one
    * mapPartitions pass — long accumulators with an overflow-guarded
    * BigInt spill, so each partition emits exactly dim²+dim rows
    * (scatter partial + per-dim sum partial) instead of shipping
    * n·dim² exploded rows into the hash aggregate (the r9 sweep's
    * 8.9×-at-10× row; the lshIndexRows "few output rows per input"
    * mapPartitions criterion applies with dim²/partition ≪ n·dim²).
    * One tiny groupBy reduces the partials; the iteration itself runs
    * on the collected dim×dim matrix — a BOUNDED driver step (64²
    * decimals here; the k-means-centroid precedent),
    * corpus-size-independent.
    * Returns (d 1-based, v on the G grid, lam) — empty when the corpus
    * is empty, mirroring the oracle's empty join chain.
    */
  def pcaTopComponent(df: DataFrame, vecCol: String,
      iters: Int = 6): DataFrame = {
    val spark = df.sparkSession
    val dec = "decimal(38,0)"
    val e = df.select(toGrid(col(vecCol)).as("__q"))
      .where(col("__q").isNotNull)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lam",
        org.apache.spark.sql.types.DecimalType(38, 0))))
    val n = e.count()
    if (n == 0)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
    // per-partition partial sums of Σqqᵀ (rows i ≥ 1) and Σq (i = 0):
    // long accumulators with a headroom-guarded BigInt spill keep the
    // inner loop allocation-free while staying exact at any corpus size
    val partSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.DecimalType(38, 0), nullable = false)))
    val partials = e.mapPartitions { it =>
      scatterPartials(it.map(_.getSeq[Long](0)))
    }(org.apache.spark.sql.Encoders.row(partSchema))
    val red = partials.groupBy("i", "j")
      .agg(sum(col("p")).as("p")).persist()
    val sums = red.where(col("i") === 0)
      .select(col("j").as("d"), col("p").as("sd"))
    val prods = red.where(col("i") > 0)
    val scat = prods
      .join(sums.select(col("d").as("i"), col("sd").as("si")), "i")
      .join(sums.select(col("d").as("j"), col("sd").as("sj")), "j")
      .select(col("i"), col("j"),
        (lit(n).cast(dec) * col("p") - col("si") * col("sj")).as("sv"))
    val entries = scat.collect() // bounded: dim² rows
    red.unpersist()
    val dim = entries.iterator.map(_.getInt(0)).max
    val smat = Array.ofDim[BigInt](dim, dim)
    entries.foreach { r =>
      smat(r.getInt(0) - 1)(r.getInt(1) - 1) = BigInt(r.getDecimal(2)
        .toBigInteger)
    }
    val grid = BigInt(KmeansGrid)
    def mul(v: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((a, j) => a + smat(i)(j) * v(j)))
    var v = Array.fill(dim)(grid)
    for (_ <- 1 to iters) {
      val w = mul(v)
      val m = w.iterator.map(_.abs).max
      v = if (m == 0) Array.fill(dim)(BigInt(0))
          else w.map(x => x * grid / m) // BigInt / truncates toward 0 = //
    }
    val den = v.foldLeft(BigInt(0))((a, x) => a + x * x)
    val num = {
      val sv = mul(v)
      (0 until dim).foldLeft(BigInt(0))((a, i) => a + v(i) * sv(i))
    }
    val lam = if (den == 0) BigInt(0) else num / den
    val rows = (0 until dim).map { i =>
      org.apache.spark.sql.Row(i + 1, v(i).toLong,
        new java.math.BigDecimal(lam.bigInteger))
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
  }

  /** One partition's exact partial sums for [[pcaTopComponent]]'s
    * scatter assembly: emits (i ≥ 1, j, Σ xᵢxⱼ-partial) for the full
    * dim×dim (accumulated on the upper triangle, mirrored at emit —
    * integer products commute exactly) plus (0, j, Σ xⱼ-partial)
    * per-dim sum rows. Hot loop is long-typed multiply-adds; a
    * headroom counter tracks the worst-case accumulated magnitude and
    * spills to BigInt BEFORE any long add could overflow, so the
    * partials are exact at any corpus size (a vector with components
    * beyond ±3·10⁹ on the grid routes straight to the BigInt path —
    * its square alone would overflow the headroom arithmetic).
    */
  private def scatterPartials(vecs: Iterator[Seq[Long]])
      : Iterator[org.apache.spark.sql.Row] = {
    var dim = 0
    var accP: Array[Long] = null // upper triangle, flattened
    var accS: Array[Long] = null
    var bigP: Array[java.math.BigInteger] = null
    var bigS: Array[java.math.BigInteger] = null
    var headroom = Long.MaxValue
    def init(d: Int): Unit = {
      dim = d
      accP = new Array[Long](d * (d + 1) / 2)
      accS = new Array[Long](d)
      bigP = Array.fill(d * (d + 1) / 2)(java.math.BigInteger.ZERO)
      bigS = Array.fill(d)(java.math.BigInteger.ZERO)
    }
    def spill(): Unit = {
      var k = 0
      while (k < accP.length) {
        if (accP(k) != 0) {
          bigP(k) = bigP(k).add(java.math.BigInteger.valueOf(accP(k)))
          accP(k) = 0
        }
        k += 1
      }
      k = 0
      while (k < accS.length) {
        if (accS(k) != 0) {
          bigS(k) = bigS(k).add(java.math.BigInteger.valueOf(accS(k)))
          accS(k) = 0
        }
        k += 1
      }
      headroom = Long.MaxValue
    }
    vecs.foreach { q =>
      val d = q.length
      if (d > 0) {
        if (accP == null) init(d)
        require(d == dim, s"pca: ragged vector dims ($d vs $dim)")
        val x = new Array[Long](d)
        var mb = 0L
        var i = 0
        while (i < d) {
          x(i) = q(i)
          val a = math.abs(x(i))
          if (a > mb) mb = a
          i += 1
        }
        if (mb >= 3000000000L) {
          // giant components: exact BigInt path, no headroom arithmetic
          var k = 0
          i = 0
          while (i < d) {
            var j = i
            while (j < d) {
              bigP(k) = bigP(k).add(java.math.BigInteger.valueOf(x(i))
                .multiply(java.math.BigInteger.valueOf(x(j))))
              k += 1; j += 1
            }
            bigS(i) = bigS(i).add(java.math.BigInteger.valueOf(x(i)))
            i += 1
          }
        } else {
          val bound = math.max(mb * mb, mb) + 1
          if (bound > headroom) spill()
          headroom -= bound
          var k = 0
          i = 0
          while (i < d) {
            val xi = x(i)
            var j = i
            while (j < d) { accP(k) += xi * x(j); k += 1; j += 1 }
            accS(i) += xi
            i += 1
          }
        }
      }
    }
    if (accP == null) Iterator.empty
    else {
      spill()
      val out = new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.Row](dim * dim + dim)
      var k = 0
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          val p = new java.math.BigDecimal(bigP(k))
          out += org.apache.spark.sql.Row(i + 1, j + 1, p)
          if (j != i) out += org.apache.spark.sql.Row(j + 1, i + 1, p)
          k += 1; j += 1
        }
        out += org.apache.spark.sql.Row(0, i + 1,
          new java.math.BigDecimal(bigS(i)))
        i += 1
      }
      out.iterator
    }
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * per-query rank lists — the standard hybrid-retrieval combiner
    * (lexical BM25 arm ⊕ dense cosine arm in every RAG stack): each
    * candidate scores Σ 1/(kRrf + rank_i) over the arms that ranked it
    * (absent arm contributes 0), re-ranked per query with id
    * tie-breaks. Rank-space fusion needs NO score calibration between
    * arms — the reason RRF beats raw-score interpolation when one arm
    * is BM25 logs and the other cosine in [-1,1].
    *
    * Both inputs carry (query_id, neighbor_id, rank). The fusion frame
    * is |queries| × (≤ 2·arm-k) rows — bounded by construction, a
    * full-outer equi-join plus one per-query window; at 100 TB the cost
    * lives in the arms (already top-k-bounded), never here. The score
    * is ONE double addition of two exact reciprocals, so any engine
    * replays it bit-for-bit.
    *
    * @return (query_id, neighbor_id, rrf, rank), rank ≤ topK.
    */
  def rrfFuse(armA: DataFrame, armB: DataFrame, topK: Int,
      kRrf: Int = 60): DataFrame = {
    require(topK > 0 && kRrf >= 0)
    val a = armA.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("__ra"))
    val b = armB.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("__rb"))
    val fused = a.join(b, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__ra").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__rb").cast("double")),
          lit(0.0)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("neighbor_id"))
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select("query_id", "neighbor_id", "rrf", "rank")
  }
}
