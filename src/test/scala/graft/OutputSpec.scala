package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Output

/** Deterministic sharded writer: shard assignment, within-shard order,
  * file-size bounds, and stability of the written bytes across input
  * partitionings — the contract a resumable 100 TB corpus write needs.
  */
class OutputSpec extends SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    spark.range(n).select(col("id").as("doc_id"),
      concat(lit("doc body number "), col("id")).as("text"))
  }

  /** (shard -> ordered content) digest read back from a write. */
  private def digest(path: String): Map[Int, Seq[(Long, String)]] =
    spark.read.parquet(path)
      .select(col("shard").cast("int"), col("doc_id"), col("text"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (s, rows) =>
        s -> rows.map(r => (r.getLong(1), r.getString(2))).toSeq.sorted
      }

  test("shard assignment is total, deterministic, and re-read matches") {
    val dir = Files.createTempDirectory("graft_out").toString + "/p"
    val df = corpus(200)
    Output.writeSharded(df, "doc_id", dir, numShards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 200)
    // every row landed in the shard its id hashes to
    val mismatched = back
      .where(col("shard").cast("int") =!= Output.shardId(col("doc_id"), 4))
      .count()
    assert(mismatched === 0)
    // all shards in range and used (200 rows over 4 hash shards)
    val shards = back.select(col("shard").cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted
    assert(shards.forall(s => s >= 0 && s < 4) && shards.length === 4)
  }

  test("written content is identical across input partitionings") {
    val base = Files.createTempDirectory("graft_out").toString
    val df = corpus(300)
    Output.writeSharded(df.repartition(1), "doc_id", s"$base/a", 5)
    Output.writeSharded(df.repartition(11, col("text")), "doc_id", s"$base/b", 5)
    assert(digest(s"$base/a") === digest(s"$base/b"))
  }

  test("files are bounded by maxRecordsPerFile and sorted within") {
    val dir = Files.createTempDirectory("graft_out").toString + "/p"
    Output.writeSharded(corpus(120), "doc_id", dir, numShards = 3,
      maxRecordsPerFile = 10)
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val rows = spark.read.parquet(f.getPath).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows.length <= 10, s"${f.getName}: ${rows.length} rows")
      assert(rows === rows.sorted, s"${f.getName} not sorted by id")
    }
  }

  test("orc format round-trips with the same shard layout") {
    val dir = Files.createTempDirectory("graft_out").toString + "/o"
    Output.writeSharded(corpus(60), "doc_id", dir, numShards = 3,
      format = "orc")
    val back = spark.read.orc(dir)
    assert(back.count() === 60)
    val mismatched = back
      .where(col("shard").cast("int") =!= Output.shardId(col("doc_id"), 3))
      .count()
    assert(mismatched === 0)
  }

  test("jsonl format round-trips") {
    val dir = Files.createTempDirectory("graft_out").toString + "/j"
    val df = corpus(50)
    Output.writeSharded(df, "doc_id", dir, numShards = 2, format = "json")
    val back = spark.read.json(dir)
    assert(back.count() === 50)
    assert(back.columns.sorted === Array("doc_id", "shard", "text"))
    // content survives the text round-trip
    val got = back.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(7L) === "doc body number 7")
  }
}
