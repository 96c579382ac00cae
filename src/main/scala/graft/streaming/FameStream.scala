package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.api.FameSession
import graft.kernels.{BusinessCalendar, Nlrx}

/** Micro-batched FAME ingest: the streaming twin of
  * [[graft.api.FameSession.run]], closing the batch/streaming asymmetry
  * the reference's `fame_script_master.inp` CLI leaves open (reference
  * runs scripts only as one-shot batch jobs,
  * `fame2py_converter.py:785-796`).
  *
  * FAME semantics are whole-series — backward recursions (SHIFT_PCT),
  * frequency converts, and `pct`/lag chains read arbitrarily far back in
  * history — so a FAME program cannot be evaluated incrementally over
  * only the arriving rows. The honest streaming form is
  * snapshot-recompute inside `foreachBatch`, the standard lakehouse
  * bronze→gold loop:
  *
  *  1. each micro-batch APPENDS to a standing bronze table
  *     (`bronzeDir/batch=<id>` — batch-id-keyed subdir written with
  *     overwrite, so a replayed batch after checkpoint recovery
  *     overwrites its own output instead of double-appending:
  *     idempotent exactly-once bronze);
  *  2. the full accumulated frame re-runs the script (one Catalyst
  *     plan, exactly the batch path — zero forked semantics);
  *  3. the result lands as an overwritten gold snapshot at `resultDir`.
  *
  * Scale shape: the recompute cost is O(history) per batch — the right
  * trade for LOW-frequency series frames (the FAME domain: decades of
  * monthly observations are thousands of rows per entity, and
  * `partitionKeys` parallelizes entities). It is NOT the shape for
  * high-rate event streams; those use the incremental
  * [[StreamOps]]/[[graft.ops.EventOps]] operators. Readers of the gold
  * snapshot see atomic versions per Spark's parquet overwrite commit
  * protocol.
  */
object FameStream {

  /** Start the micro-batched loop; returns the running query (caller
    * stops it). `stream` must carry the same columns a batch
    * [[FameSession.run]] input would (dateCol + series columns).
    */
  def run(stream: DataFrame, script: String, bronzeDir: String,
      resultDir: String, dateCol: String = "DATE",
      partitionKeys: Seq[String] = Nil,
      nlrx: Nlrx = Nlrx.HpSmoother,
      businessCal: BusinessCalendar = BusinessCalendar.WeekdaysOnly,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val spark = stream.sparkSession
    val cols = stream.columns.toIndexedSeq
    var w = stream.writeStream.outputMode("append")
    checkpointDir.foreach(c => w = w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$bronzeDir/batch=$batchId")
      // partition discovery adds the synthetic `batch` column; project
      // back to the input columns before handing FAME the frame
      val full = spark.read.parquet(bronzeDir)
        .select(cols.map(org.apache.spark.sql.functions.col): _*)
      val out = FameSession.run(script, full, dateCol, partitionKeys,
        nlrx, businessCal = businessCal).df
      out.write.mode("overwrite").parquet(resultDir)
      ()
    }.start()
  }
}
