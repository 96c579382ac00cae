package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (nearest-predecessor) join — align each left row with the latest
  * right row at or before its timestamp, per key. The canonical time-series
  * alignment primitive (quotes→trades, series at mixed frequencies); SQL
  * engines ship it natively (DuckDB `ASOF JOIN`), Spark does not.
  *
  * NOT implemented as an inequality join: a `l.ts >= r.ts` theta-join has
  * no equi-condition beyond the key, so Spark would plan a per-key
  * cross-product and filter — quadratic in rows-per-key. Instead both
  * sides are unioned and sorted once per key, and the match is a running
  * `last(_, ignoreNulls)` window over the right-side payload: ONE shuffle
  * on the key, linear scan per key, codegen'd end to end. This is the
  * standard scalable formulation (a merge-join in disguise) and survives
  * 100× row counts — a key's rows stream through a single sorted pass.
  *
  * Equal timestamps on opposite sides match (`l.ts >= r.ts`, right sorts
  * first), mirroring DuckDB. Right rows should be unique per (key, ts) —
  * among exact ties the survivor is unspecified, as in DuckDB.
  */
object AsOfJoin {

  /** Backward as-of join: latest right row with `r.tsCol <= l.tsCol`.
    *
    * @param on           equality key columns (present on both sides)
    * @param leftTs       left timestamp column name
    * @param rightTs      right timestamp column name (may differ)
    * @param rightPayload right columns to carry onto matched left rows
    *                     (must not collide with left column names; include
    *                     `rightTs` to see the matched time)
    * @param toleranceSec optional max age in seconds: matches older than
    *                     `l.ts - tol` are nulled out (timestamp or numeric
    *                     ts columns; timestamps compare at second scale)
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceSec: Option[Double] = None): DataFrame =
    join(left, right, on, leftTs, rightTs, rightPayload, toleranceSec,
      forward = false)

  /** Forward as-of join: earliest right row with `r.tsCol >= l.tsCol`. */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceSec: Option[Double] = None): DataFrame =
    join(left, right, on, leftTs, rightTs, rightPayload, toleranceSec,
      forward = true)

  private def join(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceSec: Option[Double], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.intersect(leftCols).isEmpty,
      s"rightPayload collides with left columns: " +
        rightPayload.intersect(leftCols).mkString(", "))
    // unified row shape: key, event time, side tag, and one struct per
    // side (null on the other side) so the union is schema-stable
    val lStruct = StructType(leftCols.map(c => left.schema(c)))
    val rStruct = StructType(rightPayload.map(c => right.schema(c)) :+
      StructField("__rts", right.schema(rightTs).dataType))
    val lRow = left.select(
      on.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(rStruct).as("__r"): _*)
    val rRow = right.select(
      on.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(lStruct).as("__l") :+
        struct((rightPayload.map(col) :+ col(rightTs).as("__rts")): _*)
          .as("__r"): _*)
    // sort so the qualifying right row is always BEHIND the left row:
    // backward → ascending time; forward → descending time. At equal ts
    // the right side must come first (>= / <= includes ties).
    val ord =
      if (forward) Seq(col("__ts").desc, col("__side").asc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lRow.union(rRow)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val inTol = toleranceSec match {
      case None => col("__m").isNotNull
      case Some(tol) =>
        val age =
          if (forward) col("__m.__rts").cast("double") - col("__ts").cast("double")
          else col("__ts").cast("double") - col("__m.__rts").cast("double")
        col("__m").isNotNull && age <= tol
    }
    val payload = rightPayload.map(p =>
      when(inTol, col("__m").getField(p)).as(p))
    matched.select(leftCols.map(c => col(s"__l.$c").as(c)) ++ payload: _*)
  }
}
