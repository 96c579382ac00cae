package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-prep step after token counting:
  * documents are concatenated in a deterministic order and sliced into
  * fixed `seqLen`-token training sequences, and each document needs to
  * know which sequence (pack) it starts in and at what offset (the
  * standard packed-pretraining layout; boundary documents span two
  * packs).
  *
  * Scale shape: the corpus is first split into md5 hash shards (the
  * [[Output.shardId]] arithmetic — deterministic, engine-reproducible),
  * then ONE window per shard computes the exclusive running token sum in
  * id order. The shard is the parallelism unit — packing is sequential
  * by definition (each document's position depends on every prior one),
  * so the global sequence is sharded exactly like the writer shards the
  * files; shards ≫ executors keeps every core busy at any corpus size,
  * and window state is O(1) per row (a running sum, spillable sort).
  */
object Packing {

  /** Assign (shard, pack_id, pack_offset) to every document.
    *
    * @param tokenCol per-doc token count column (e.g. from
    *                 [[TextOps.tokenCount]] or [[Bpe.encode]])
    * @param seqLen   tokens per training sequence
    * @param numShards number of independent packing streams
    * @param salt     [[Sampling.hashUnit]] salt for the shard draw
    * @return input columns + `shard`, `pack_id` (within shard),
    *         `pack_offset` (token offset of the doc's start in its pack)
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      seqLen: Int, numShards: Int, salt: String = ""): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", Output.shardId(col(idCol), numShards, salt))
      .withColumn("__start",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__start") / seqLen).cast("long"))
      .withColumn("pack_offset", (col("__start") % seqLen).cast("long"))
      .drop("__start")
  }
}
