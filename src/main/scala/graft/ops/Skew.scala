package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities: salting for hot keys in aggregations and
  * joins. AQE's skew-join handling covers sort-merge joins at runtime;
  * these are for the cases AQE doesn't reach (hot-key groupBys, broadcast
  * constraints) or when the skew is known up front.
  *
  * Salt is derived from `xxhash64` of a discriminator column — no RNG
  * state, so results are reproducible across retries/speculative tasks
  * (a `rand()` salt breaks exactly-once semantics under task retry).
  */
object Skew {

  /** Two-phase aggregation for algebraic aggregates over skewed keys:
    * phase 1 aggregates on (keys, salt) — spreading a hot key over
    * `saltBuckets` reducers — phase 2 merges the partials per key.
    *
    * @param aggs  (valueCol, partialAgg, mergeAgg, outName); e.g.
    *              ("x", sum, sum, "sum_x") or ("x", count, sum, "n").
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      discriminator: Column,
      aggs: Seq[(Column, Column => Column, Column => Column, String)],
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2(aggs.head._1).as(s"__p0"),
        aggs.tail.zipWithIndex.map { case ((c, p, _, _), i) =>
          p(c).as(s"__p${i + 1}")
        }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col("__p0")).as(aggs.head._4),
        aggs.tail.zipWithIndex.map { case ((_, _, m, n), i) =>
          m(col(s"__p${i + 1}")).as(n)
        }: _*)
  }

  /** Skewed equi-join: salt the big (skewed) side into `saltBuckets`
    * sub-keys and replicate the small side once per bucket, so a hot join
    * key spreads over `saltBuckets` tasks instead of one straggler.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      bigDiscriminator: Column, saltBuckets: Int = 32,
      joinType: String = "inner"): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(bigDiscriminator), lit(saltBuckets.toLong)))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
