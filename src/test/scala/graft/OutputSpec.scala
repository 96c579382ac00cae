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
    val dir = tmpDir("graft_out").toString + "/p"
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
    val base = tmpDir("graft_out").toString
    val df = corpus(300)
    Output.writeSharded(df.repartition(1), "doc_id", s"$base/a", 5)
    Output.writeSharded(df.repartition(11, col("text")), "doc_id", s"$base/b", 5)
    assert(digest(s"$base/a") === digest(s"$base/b"))
  }

  test("files are bounded by maxRecordsPerFile and sorted within") {
    val dir = tmpDir("graft_out").toString + "/p"
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
    val dir = tmpDir("graft_out").toString + "/o"
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
    val dir = tmpDir("graft_out").toString + "/j"
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

  // independent md5 reference for the shuffle-order assertions
  private def refU(id: Long, salt: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id$salt".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
      .toDouble / 4294967296.0
  }

  test("bucketed tables: co-located join plans with zero exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val base = tmpDir("graft_bkt").toString
    val docsT = corpus(300)
    val meta = spark.range(300).select(col("id").as("doc_id"),
      (col("id") % 7).as("quality_bin"))
    Output.writeBucketedTable(docsT, "bkt_docs", "doc_id", 4,
      Some(s"$base/docs"))
    Output.writeBucketedTable(meta, "bkt_meta", "doc_id", 4,
      Some(s"$base/meta"))
    try {
      // disable broadcast so the join would OTHERWISE shuffle both sides
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bkt_docs")
          .join(spark.table("bkt_meta"), "doc_id")
        val plan = joined.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
        val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
        assert(exchanges.isEmpty,
          s"bucketed join still shuffles: ${exchanges.size} exchanges")
        // correctness: all rows join, values intact
        val n = joined.where(col("quality_bin") === col("doc_id") % 7).count()
        assert(n == 300)
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_docs")
      spark.sql("DROP TABLE IF EXISTS bkt_meta")
    }
  }

  test("q88: composed pipeline re-join runs through the bucketed layout " +
      "with no exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // broadcast disabled: the downstream survivors ⋈ scores join would
    // otherwise broadcast at test scale and the assert would be vacuous
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = SparkEntry.queries("q88_bucketed_pipeline")(
        spark, "/root/testdata/sf0.001")
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty,
        "expected a sort-merge join through the bucketed tables")
      val under = smjs.flatMap(_.collect { case e: ShuffleExchangeExec => e })
      assert(under.isEmpty,
        s"composed bucketed join still shuffles: ${under.size} exchanges")
      assert(q.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_q88_docs")
      spark.sql("DROP TABLE IF EXISTS graft_q88_scores")
    }
  }

  test("shuffled write: total, hash-range sharded, files in u order") {
    val dir = tmpDir("graft_out").toString + "/s"
    Output.writeShuffled(corpus(200), "doc_id", dir, numShards = 4,
      salt = "#t")
    val back = spark.read.schema("doc_id LONG, text STRING").json(dir)
    assert(back.count() === 200)
    // every row landed in the shard its u-range dictates
    val rows = back.select("shard", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    rows.foreach { case (s, id) =>
      assert(s === math.floor(refU(id, "#t") * 4).toInt, s"doc $id") }
    // PHYSICAL line order inside each written file is ascending u —
    // read the raw jsonl bytes, not through Spark, so the assertion is
    // about bytes a trainer would stream
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
    val idRe = """"doc_id":(\d+)""".r
    files.foreach { f =>
      val us = scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(f.toPath)).asScala
        .map(l => refU(idRe.findFirstMatchIn(l).get.group(1).toLong, "#t"))
      assert(us == us.sorted, s"${f.getName} not in shuffle order")
    }
  }

  test("shuffled global order is invariant to the shard count") {
    val base = tmpDir("graft_out").toString
    val df = corpus(150)
    Output.writeShuffled(df, "doc_id", s"$base/n4", numShards = 4, salt = "#t")
    Output.writeShuffled(df, "doc_id", s"$base/n8", numShards = 8, salt = "#t")
    def globalOrder(path: String): Seq[Long] =
      spark.read.schema("doc_id LONG, text STRING").json(path)
        .select("shard", "doc_id").collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .sortBy { case (s, id) => (s, refU(id, "#t"), id) }
        .map(_._2).toSeq
    // concatenating shards 0..N-1 in u order = the same permutation for
    // any N (resharding never re-shuffles)
    assert(globalOrder(s"$base/n4") == globalOrder(s"$base/n8"))
  }

  test("partitioned write prunes at directory level: the lang filter " +
      "binds as a PartitionFilter, not a post-scan row filter") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("prune").toString
    Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "fr", "c"), (4L, "de", "d"))
      .toDF("id", "lang", "payload")
      .write.mode("overwrite").partitionBy("lang").parquet(base)
    val read = spark.read.parquet(base).where(col("lang") === "en")
    assert(read.count() == 2)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ")
        .matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*=[^\\]]*en[^\\]]*\\].*"),
      s"lang=en not a partition filter:\n$plan")
    // and NOT pushed as a data filter (it isn't in the file schema)
    assert(!plan.replaceAll("\\s+", " ")
      .matches(".*PushedFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang leaked into PushedFilters:\n$plan")
  }

  test("compaction plan invariants hold on random inventories: " +
      "row conservation, contiguity, closed groups >= target") {
    import spark.implicits._
    val rnd = new scala.util.Random(184)
    (1 to 5).foreach { _ =>
      val target = 50L + rnd.nextInt(200)
      val inv = (0 until 1 + rnd.nextInt(40)).map(i =>
        (f"f$i%03d", 1L + rnd.nextInt(500).toLong)).toDF("file", "n_rows")
      val plan = Output.compactionPlan(inv, "file", "n_rows", target)
        .orderBy("file").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      // conservation: every file present once, rows unchanged
      assert(plan.map(_._1).toSeq ==
        inv.orderBy("file").collect().map(_.getString(0)).toSeq)
      // rows_before is the exact prefix sum in file order
      assert(plan.map(_._3).toSeq ==
        plan.map(_._2).scanLeft(0L)(_ + _).init.toSeq)
      // groups contiguous and non-decreasing in walk order
      assert(plan.map(_._4).toSeq == plan.map(_._4).toSeq.sorted)
      // the TRUE invariants of DIV-binning (a first draft asserted
      // closed-group >= target; the random sweep disproved it — an
      // oversized file's overhang can leave a small group in the next
      // window): every closed group's cumulative END crosses its
      // window boundary, and #groups <= ceil(total/target)
      val total = plan.map(_._2).sum
      val grps = plan.map(_._4).distinct
      assert(grps.length <= ((total + target - 1) / target).toInt,
        s"${grps.length} groups for total=$total target=$target")
      val last = plan.map(_._4).max
      plan.groupBy(_._4).foreach { case (g, files) =>
        if (g != last) {
          val end = files.map(f => f._3 + f._2).max
          assert(end >= (g + 1) * target,
            s"closed group $g ends at $end < ${(g + 1) * target}")
        }
      }
    }
  }

  test("compaction plan: greedy cut rule, contiguous groups, closed groups reach target") {
    import spark.implicits._
    val inv = Seq(
      ("f00", 400L), ("f01", 400L), ("f02", 400L), // 0,400,800 → grp 0,0,0
      ("f03", 50L),                                // 1200 → grp 1
      ("f04", 2500L),                              // 1250 → grp 1 (oversized file stays whole)
      ("f05", 10L), ("f06", 10L))                  // 3750,3760 → grp 3
      .toDF("file", "n_rows")
    val plan = Output.compactionPlan(inv, "file", "n_rows", 1000L)
      .orderBy("file").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(plan.map(_._4).toSeq == Seq(0L, 0L, 0L, 1L, 1L, 3L, 3L))
    assert(plan.map(_._3).toSeq == Seq(0L, 400L, 800L, 1200L, 1250L, 3750L, 3760L))
    // groups are contiguous in file order
    assert(plan.map(_._4).toSeq == plan.map(_._4).toSeq.sorted)
    // on THIS inventory (no oversized-file overhang before a window)
    // closed groups also reach the target — the random-inventory
    // property test above pins the weaker invariant that always holds
    val byGrp = plan.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    val last = plan.map(_._4).max
    byGrp.filter(_._1 != last).foreach { case (g, rows) =>
      assert(rows >= 1000L, s"closed group $g undersized: $rows")
    }
  }
}
