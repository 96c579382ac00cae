package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — match point rows to interval rows that contain
  * them, per key: `p.ts BETWEEN i.start AND i.end`. Spark plans a raw
  * between-join as a per-key cross product (BroadcastNestedLoopJoin or a
  * key-only equi-join with a post filter over every pair); this is the
  * other classic time-series join Spark lacks natively (DuckDB/ASOF-class
  * engines ship it; Databricks added a dedicated range-join optimization).
  *
  * Implemented BINNED: both sides bucket their time onto a fixed grid —
  * points to one bin, intervals exploded to every bin they overlap — and
  * the join becomes an equi-join on (key, bin) with the exact `between`
  * as a residual filter. Candidate pairs are only those sharing a bucket,
  * so cost scales with true overlap density, not |points|×|intervals|;
  * the equi-join shuffles on (key, bin), which also spreads a hot key's
  * rows across its time range instead of one partition.
  *
  * `binSeconds` trades explode fan-out (long intervals → many bin rows)
  * against candidate precision (wide bins → more residual-filtered
  * pairs); set it near the typical interval length.
  *
  * Overlapping intervals produce one output row per containing interval;
  * unmatched points are dropped (inner semantics).
  */
object RangeJoin {

  /** @param on              equality key columns (present on both sides)
    * @param ptCol           point timestamp column on `points`
    * @param startCol/endCol interval bounds on `intervals` (inclusive)
    * @param intervalPayload interval columns carried onto matched points
    *                        (must not collide with point column names)
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, on: Seq[String],
      ptCol: String, startCol: String, endCol: String,
      intervalPayload: Seq[String], binSeconds: Long = 3600L): DataFrame = {
    val ptCols = points.columns.toSeq
    require(intervalPayload.intersect(ptCols).isEmpty,
      s"intervalPayload collides with point columns: " +
        intervalPayload.intersect(ptCols).mkString(", "))
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binSeconds)
    val p = points.withColumn("__bin", bin(col(ptCol)))
    val i = intervals.select(
      (on.map(col) ++ intervalPayload.map(col) :+
        col(startCol).as("__start") :+ col(endCol).as("__end")): _*)
      .withColumn("__bin",
        explode(sequence(bin(col("__start")), bin(col("__end")))))
    p.join(i, on :+ "__bin")
      .where(col(ptCol).between(col("__start"), col("__end")))
      .select(ptCols.map(col) ++ intervalPayload.map(col): _*)
  }
}
