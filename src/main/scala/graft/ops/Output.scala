package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sharded materialization — the write side of a
  * training-data pipeline. Every upstream operator here ends in a frame;
  * a real corpus run ends in sharded, stably-ordered parquet/jsonl that a
  * trainer can stream, resume, and re-produce byte-for-byte.
  *
  * Determinism contract (the property a 100 TB corpus build needs):
  *  - shard membership is a pure function of the row id
  *    ([[Sampling.hashUnit]]-derived, engine-reproducible md5 arithmetic) —
  *    re-running the pipeline, on any cluster/partitioning/AQE plan, puts
  *    every document in the same shard;
  *  - rows within a shard are written in id order (each shard is produced
  *    by exactly one task, sorted), so file contents and the
  *    `maxRecordsPerFile` split boundaries are stable across reruns;
  *  - file sizes are bounded by `maxRecordsPerFile`, so downstream
  *    loaders see uniform units regardless of corpus size.
  *
  * Scale shape: ONE hash shuffle on the shard id (numShards output
  * partitions), a per-partition sort, and a parallel columnar write —
  * no driver materialization, no global sort. `numShards` is the write
  * parallelism; size it so a shard's rows fit one task comfortably
  * (shards >> executors for a big corpus).
  */
object Output {

  /** Deterministic shard in [0, numShards): floor of the id's md5-uniform
    * scaled by the shard count. Reproducible from any engine computing the
    * same md5 arithmetic (the DuckDB oracles do).
    */
  def shardId(id: Column, numShards: Int, salt: String = ""): Column = {
    require(numShards > 0, "numShards must be positive")
    floor(Sampling.hashUnit(id, salt) * numShards).cast("int")
  }

  /** Write `df` to `path` as one directory per shard
    * (`shard=<k>/part-*.{parquet,json}`), rows sorted by `idCol` within
    * each shard, at most `maxRecordsPerFile` rows per file.
    *
    * The `repartition(numShards, shard)` clusters every row of a shard
    * into one task (hash partitioning may co-locate two shards in one
    * task — harmless: `partitionBy` still splits them into their own
    * directories, and the within-shard sort order is preserved because
    * the task sorts by (shard, id)).
    *
    * @param format "parquet" (default) or "json" (= jsonl, one object per
    *               line — the interchange format trainers ingest)
    */
  def writeSharded(df: DataFrame, idCol: String, path: String,
      numShards: Int, format: String = "parquet",
      maxRecordsPerFile: Long = 1L << 20, salt: String = ""): Unit = {
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — rename it; writeSharded owns " +
        "that name for the derived partition key")
    df.withColumn("shard", shardId(col(idCol), numShards, salt))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .format(format)
      .save(path)
  }

  /** Engine-reproducible 32-bit content hash of the given columns (md5 of
    * the "|"-joined string forms) — the per-row term of a shard digest.
    * Summing it per shard gives an order-independent content checksum any
    * SQL engine can recompute.
    */
  def rowHash(cols: Column*): Column =
    Sampling.md5Prefix32(concat_ws("|", cols: _*))

  /** Bucketed-table write: the co-located-join primitive. The table is
    * hash-bucketed AND sorted by `keyCol` at write time, so any two
    * tables bucketed the same way (same key, same bucket count)
    * sort-merge-join with NO exchange and NO sort on either side — the
    * shuffle is paid ONCE at write, then every downstream join of the
    * fact/dim/embedding tables that a corpus pipeline re-joins per run
    * reads co-located buckets. This is the table-layout complement of
    * [[writeSharded]] (which optimizes streaming reads, not joins);
    * OutputSpec asserts the exchange-free join plan.
    *
    * Registered through the session catalog (`saveAsTable` — bucket
    * metadata lives there; a plain `save(path)` cannot record it). Pass
    * `path` to keep the data external to the warehouse directory.
    */
  def writeBucketedTable(df: DataFrame, table: String, keyCol: String,
      numBuckets: Int, path: Option[String] = None): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keyCol).sortBy(keyCol)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Deterministic GLOBAL training-order shuffle, written as shards: the
    * permutation is "order by the salted md5-uniform u" — a full
    * reshuffle of the corpus that any engine reproduces exactly. Shard k
    * holds the u-range [k/N, (k+1)/N) (hash-RANGE sharding: `floor(u·N)`
    * is both the shard id and the range bound), and rows within a shard
    * are written in (u, id) order, so concatenating shard 0..N−1 streams
    * the whole permutation WITHOUT any global sort: one hash shuffle +
    * per-task sort, same cost envelope as [[writeSharded]]. This is the
    * "shuffle the corpus once, globally, reproducibly" step a trainer
    * needs before sequential epoch reads; resharding to a different N
    * preserves the global order (u doesn't change), so the layout is
    * re-shardable without re-shuffling.
    *
    * Default format is jsonl — the interchange layout trainers ingest.
    */
  def writeShuffled(df: DataFrame, idCol: String, path: String,
      numShards: Int, format: String = "json",
      maxRecordsPerFile: Long = 1L << 20, salt: String = ""): Unit = {
    require(numShards > 0, "numShards must be positive")
    require(!df.columns.contains("shard") && !df.columns.contains("__u"),
      "input already has a 'shard'/'__u' column — rename it; writeShuffled " +
        "owns those names for the derived order/partition keys")
    df.withColumn("__u", Sampling.hashUnit(col(idCol), salt))
      .withColumn("shard", floor(col("__u") * numShards).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__u"), col(idCol))
      .drop("__u")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .format(format)
      .save(path)
  }

  /** Small-file compaction plan — the OPTIMIZE/rewrite step every
    * long-lived lakehouse table needs: after months of incremental
    * appends a table is thousands of undersized files and every scan
    * pays per-file open/footer/scheduling overhead. Given a file
    * inventory (`fileCol`, `nRowsCol`) this assigns each file to a
    * merge group by the streaming greedy rule Delta/Iceberg compactors
    * use: walk files in `fileCol` order, cut a new group every time the
    * running total passes a multiple of `targetRows` — group id =
    * ⌊rows-before-this-file / target⌋. Groups are contiguous in the
    * walk order, every CLOSED group's cumulative end crosses its
    * window boundary (≥ (g+1)·target rows seen once it closes), and
    * the group count is at most ⌈total/target⌉ — the file-count
    * reduction OPTIMIZE is after. Note the honest limit (found by the
    * OutputSpec property test): an OVERSIZED file that overhangs into
    * the next window can leave that window's group smaller than
    * target — per-group minimums would need a stateful
    * reset-on-threshold fold, which no window cumsum (and so no
    * cross-engine replay) expresses. The plan is a pure function of
    * the inventory — any engine replays it with one window cumsum.
    *
    * Scale shape: the plan frame is FILE-inventory-sized (thousands of
    * rows for a 100 TB table), not row-sized; the single unpartitioned
    * window is bounded by the file count, never the corpus. Returns
    * (fileCol, nRowsCol, rows_before, grp).
    */
  def compactionPlan(inventory: DataFrame, fileCol: String,
      nRowsCol: String, targetRows: Long): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    val w = Window.orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    inventory
      .withColumn("rows_before",
        coalesce(sum(col(nRowsCol)).over(w), lit(0L)))
      .withColumn("grp", expr(s"rows_before DIV ${targetRows}L"))
      .select(col(fileCol), col(nRowsCol).cast("long").as(nRowsCol),
        col("rows_before"), col("grp"))
  }
}
