package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced corpus ingestion — the read side of the pipeline.
  * Raw corpora arrive as jsonl/csv drops that are never fully clean:
  * truncated lines, stray non-JSON records, schema drift. The ingest
  * contract here is EXPLICIT and total: every input line is either a
  * schema-conforming row or lands in the quarantine column — nothing is
  * silently dropped (Spark's DROPMALFORMED) and nothing aborts a 100-TB
  * read at the first bad byte (FAILFAST).
  *
  * Scale shape: readers are plain distributed scans (splittable files →
  * one task per split; a `.gz` jsonl file is one task by nature of the
  * codec — shard uploads accordingly). Quarantine is a per-row
  * projection; the good/bad split is a filter, so pushdown and column
  * pruning stay intact on the good path.
  */
object Input {

  /** The quarantine column name every reader here uses. */
  val CorruptCol = "_corrupt"

  /** Read jsonl (one JSON object per line) under `path` with an enforced
    * schema: conforming lines become typed rows with `_corrupt` null;
    * malformed lines keep their raw text in `_corrupt` with all schema
    * fields null. Missing fields are null (schema drift shows up as
    * nulls, not failures); extra fields are ignored.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already has $CorruptCol")
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Csv twin of [[readJsonl]]: header expected, enforced schema,
    * malformed lines quarantined in `_corrupt`.
    */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already has $CorruptCol")
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }

  /** Split a quarantining read into (good rows without the quarantine
    * column, bad-row frame of raw lines). Callers persist `df` first if
    * both sides get consumed — the split is two filters over one scan.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = (
    df.where(col(CorruptCol).isNull).drop(CorruptCol),
    df.where(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw")))
}
