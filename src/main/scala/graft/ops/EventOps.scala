package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics — the batch twins of
  * [[graft.streaming.StreamOps]], sharing semantics so a pipeline can be
  * developed on historical parquet and deployed on `readStream` unchanged.
  *
  * Scale: both operators shuffle once on (user) / (window, type); the
  * sessionizer is the classic lag+cumsum pattern — per-user windows, no
  * state store, no driver involvement.
  */
object EventOps {

  /** Tumbling-window counts + value sums per event type (batch form of
    * `StreamOps.windowedCounts` — same `window()` semantics).
    */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value",
      windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization over historical events: a new session starts
    * when the previous event of the same user is more than `gapMinutes`
    * older. One shuffle on user; session ids assigned with lag + running
    * sum inside the per-user window.
    */
  def sessionize(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    // microsecond-exact gap (a cast to seconds truncates sub-second parts
    // and misclassifies events straddling the gap boundary)
    val gapExpr: Column = unix_micros(col(tsCol)) -
      lag(unix_micros(col(tsCol)), 1).over(w)
    val newSession = when(
      gapExpr.isNull || gapExpr > gapMinutes * 60L * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
  }
}
