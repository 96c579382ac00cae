package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/** Unit tests for the training-data-pipeline operators (dedup, similarity,
  * text analysis, multimodal plumbing) on hand-built fixtures.
  */
class OpsSpec extends SparkSpec {

  private def docFrame(rows: (Long, String)*): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (i, t) => Row(i, t) }).asJava), schema)
  }

  test("exact dedup keeps min id and counts the group") {
    val df = docFrame(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
    val out = Dedup.exact(df, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (3L, 1L))) // normalization merges 1 and 2
    // the fingerprint-key shuffle (the 100 TB path: 32-byte md5 through
    // the exchange instead of the full text) produces identical groups
    val fp = Dedup.exact(df, "doc_id", "text", byFingerprint = true)
      .orderBy("keep_id").collect()
    assert(fp.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      out.map(r => (r.getLong(1), r.getLong(2))).toSeq)
    // and the incremental form agrees across both key choices
    val ref = docFrame((9L, "hello   world"), (10L, "standing corpus"))
    val a = Dedup.exactAgainst(df, ref, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Dedup.exactAgainst(df, ref, "doc_id", "text",
      byFingerprint = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a == Set(3L)) // 1 and 2 match the reference text
  }

  test("minhash LSH finds a near-duplicate pair and estimates jaccard") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val distinct = (100 to 140).map(i => s"zzz$i").mkString(" ")
    val df = docFrame((1L, base), (2L, nearDup), (3L, distinct))
    val pairs = Dedup.minHashLshPairs(df, "doc_id", "text",
      numHashes = 32, bands = 16, shingleWidth = 2).collect()
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined, s"expected (1,2) pair, got ${pairs.toSeq}")
    // true 2-shingle jaccard: |A∩B|=37, |A∪B|=41+... compute: A has 39
    // shingles, B has 39, common 37 → 37/(39+39-37)=37/41
    assert(math.abs(p12.get.getDouble(3) - 37.0 / 41.0) < 1e-9)
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("minHashLshPairs releases its intermediate caches") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val df = docFrame((1L, base), (2L, base + " tokX"))
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Dedup.minHashLshPairs(df, "doc_id", "text",
      numHashes = 16, bands = 8, shingleWidth = 2).count()
    val fresh = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    // only the (tiny, GC-managed) checkpointed result may survive — the
    // shingle and signature caches must be gone
    assert(fresh.size <= 1, s"leaked cached RDDs: $fresh")
    // same discipline for the incremental variant
    val before2 = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Dedup.minHashLshAgainstPairs(df, docFrame((9L, base)), "doc_id", "text",
      numHashes = 16, bands = 8, shingleWidth = 2).count()
    val fresh2 = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before2
    assert(fresh2.size <= 1, s"leaked cached RDDs: $fresh2")
  }

  test("connected components resolve chains, forks and singletons") {
    val schema = StructType(Seq(
      StructField("id1", LongType), StructField("id2", LongType)))
    // chain 1-2-3, pair 5-6, fork 8-{9,10}, long chain 20..40 (exercises
    // pointer jumping past the naive round count), singletons 4 and 7
    val chain = (20L until 40L).map(i => (i, i + 1))
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (8L, 10L)) ++ chain
    val pairsDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(pairs.map { case (a, b) => Row(a, b) }).asJava), schema)
    val universe = docFrame(((1L to 10L) ++ (20L to 40L)).map(i => (i, "x")): _*)
    val cc = Dedup.connectedComponents(pairsDf, "id1", "id2",
      universe, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(cc(_) == 1L))
    assert(cc(4L) == 4L && cc(7L) == 7L)
    assert(cc(5L) == 5L && cc(6L) == 5L)
    assert(Seq(8L, 9L, 10L).forall(cc(_) == 8L))
    assert((20L to 40L).forall(cc(_) == 20L))
    // the distributed propagation loop (forced by a zero broadcast
    // threshold) must agree with the driver union-find path exactly
    val dist = Dedup.connectedComponents(pairsDf, "id1", "id2",
      universe, "doc_id", maxBroadcastEdges = -1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == cc)
  }

  test("giant dup cluster beyond maxBroadcastEdges: distributed path, log rounds") {
    // one component whose edge list EXCEEDS the broadcast threshold, so
    // the size rule itself (not a forced override) picks the distributed
    // label-propagation path — the shape it exists for: a boilerplate
    // mega-cluster at corpus scale. A chain is the worst case for
    // propagation (diameter = n), so it also pins the pointer-jumping
    // claim: 4096 nodes must converge in maxRounds = 12 « diameter —
    // if jumping regressed to linear propagation the labels would come
    // out wrong and this fails loudly.
    val n = 4096L
    val schema = StructType(Seq(StructField("id1", LongType),
      StructField("id2", LongType)))
    val chain = (0L until n - 1).map(i => Row(i, i + 1))
    val pairsDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(chain).asJava), schema).repartition(8)
    val universe = spark.range(n + 10).select(col("id").as("doc_id"))
    val cc = Dedup.connectedComponents(pairsDf, "id1", "id2", universe,
      "doc_id", maxRounds = 12, maxBroadcastEdges = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until n).forall(cc(_) == 0L), "chain must collapse to node 0")
    assert((n until n + 10).forall(i => cc(i) == i), "singletons untouched")
  }

  test("leakage-free split: near-dup components move atomically, singletons hash alone") {
    val schema = StructType(Seq(
      StructField("id1", LongType), StructField("id2", LongType)))
    // chain 1-2-3 and pair 5-6 must each land in ONE split; 4 and 7
    // draw independently
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L))
    val pairsDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(pairs.map { case (a, b) => Row(a, b) }).asJava), schema)
    val universe = docFrame((1L to 7L).map(i => (i, "x")): _*)
    val out = Dedup.leakageFreeSplit(pairsDf, "id1", "id2", universe,
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "#s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byComp = out.groupBy(_._2)
    // atomicity: one split value per component
    byComp.foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == 1)
    }
    // the split is a function of the COMPONENT hash: a singleton whose
    // id equals a cluster's min label draws the same verdict as the
    // cluster — pin by recomputing the expected uniform
    val expected = out.map { case (_, compId, _) =>
      graft.ops.Sampling.hashUnit(lit(compId), "#s")
    }
    val us = universe.sparkSession.range(1)
      .select(expected: _*).head().toSeq.map(_.asInstanceOf[Double])
    out.zip(us).foreach { case ((_, _, split), u) =>
      val want = if (u < 0.8) "train" else if (u < 0.9) "val" else "test"
      assert(split == want)
    }
  }

  test("c4 line filter: each line rule and each doc gate fires independently") {
    val df = docFrame(
      // 3 good lines → kept doc; short/no-punct/javascript lines drop
      (1L, "one fine sentence that clearly ends well.\n" +
        "tiny line.\n" +
        "a second proper sentence with enough words here.\n" +
        "this line has no terminal punctuation at all\n" +
        "please enable javascript and cookies to continue.\n" +
        "the third fully valid sentence closes the doc!"),
      // only 2 surviving lines → doc dropped by the ≥3-line gate
      (2L, "just one good sentence lives in this document.\n" +
        "and exactly one more survives the line rules?"),
      // lorem ipsum kills the page even with 3 good lines
      (3L, "a perfectly good first sentence sits right here.\n" +
        "lorem ipsum dolor sit amet consectetur adipiscing elit.\n" +
        "and a third acceptable sentence finishes it off."),
      // a curly brace anywhere kills the page
      (4L, "good sentence number one stands at the top.\n" +
        "good sentence number two follows right behind.\n" +
        "good sentence number three mentions code = { }."))
    val out = TextOps.c4LineFilter(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getString(4)))
    assert(out(0) == ((1L, 6L, 3L, true,
      "one fine sentence that clearly ends well.\n" +
      "a second proper sentence with enough words here.\n" +
      "the third fully valid sentence closes the doc!")))
    assert(out(1)._4 == false && out(1)._3 == 2L)
    assert(out(2)._4 == false && out(2)._3 == 3L) // lines fine, page killed
    assert(out(3)._4 == false) // the { gate
  }

  test("pca power iteration finds the dominant axis with exact grid arithmetic") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // points on the line (t, 0.1t, 0): top PC must align with axis 1,
    // carry a ~10% axis-2 component, and ignore axis 3 entirely
    val pts = Seq(-1.0f, -0.5f, 0.5f, 1.0f).zipWithIndex.map {
      case (t, i) => Row(i.toLong, Seq(t, 0.1f * t, 0.0f))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(pts).asJava), schema)
    val out = Similarity.pcaTopComponent(df, "embedding")
      .orderBy("d").collect()
    assert(out.length == 3)
    val v = out.map(_.getLong(1))
    assert(v(0) == 1000000L, "dominant axis saturates the grid")
    assert(math.abs(v(1) - 100000L) <= 2, "second axis ~10%")
    assert(v(2) == 0L, "orthogonal axis is exactly zero")
    val lam = out.head.getDecimal(2)
    assert(lam.signum > 0, "top eigenvalue of a non-degenerate cloud is positive")
    // empty corpus → empty frame (the oracle's empty join chain)
    val empty = Similarity.pcaTopComponent(
      df.where(col("vec_id") < 0), "embedding")
    assert(empty.count() == 0)
  }

  test("pii scrub replaces emails, urls and phones; counts match") {
    import org.apache.spark.sql.functions.col
    val df = docFrame(
      (1L, "mail me at jo.doe+x@test.org or visit https://a.b/c?d=1 soon"),
      (2L, "call 555-123-4567 twice: 555-123-4567"),
      (3L, "clean text with no pii at all"))
    val out = df.select(col("doc_id"),
      TextOps.scrubPii(col("text")).as("s"),
      TextOps.emailCount(col("text")).as("ne"),
      TextOps.urlCount(col("text")).as("nu"),
      TextOps.phoneCount(col("text")).as("np"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "mail me at <EMAIL> or visit <URL> soon")
    assert(out(0).getInt(2) == 1 && out(0).getInt(3) == 1 && out(0).getInt(4) == 0)
    assert(out(1).getString(1) == "call <PHONE> twice: <PHONE>")
    assert(out(1).getInt(4) == 2)
    assert(out(2).getString(1) == "clean text with no pii at all")
  }

  test("repetition signals: top-token and dup-bigram fractions") {
    import org.apache.spark.sql.functions.col
    val df = docFrame(
      (1L, "spam spam spam spam"),        // one token everywhere
      (2L, "a b c d"),                    // no repetition at all
      (3L, "to be or not to be"),         // 'to be' bigram repeats
      (4L, "go go go stop"),              // 'go go' bigram repeats
      (5L, ""),                           // empty -> both 0
      (6L, "solo"))                       // single token: takes all tokens
    val out = df.select(col("doc_id"),
      TextOps.topTokenFrac(col("text")).as("t"),
      TextOps.dupBigramFrac(col("text")).as("b"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == (1.0, 2.0 / 3))     // bigrams: 3x 'spam spam' -> 2/3 dup
    assert(out(2L) == (0.25, 0.0))
    assert(out(3L) == (2.0 / 6, 0.2))     // 'to be' twice of 5 bigrams
    assert(out(4L) == (0.75, 1.0 / 3))    // 'go go' twice of 3 bigrams
    assert(out(5L) == (0.0, 0.0) && out(6L) == (1.0, 0.0))
  }

  test("contamination screen: overlap counts, short docs, df cap") {
    val boiler = "all rights reserved by the site"      // 6-token boilerplate
    val secret = "the quick brown fox jumps high today" // 7 tokens
    val train = docFrame(
      (1L, s"intro words $secret and an outro"),  // shares secret's 5-grams
      (2L, s"$boiler plus unrelated content here"),
      (3L, "totally different text with nothing shared at all"),
      (4L, "tiny doc"))                           // < 5 tokens: no grams
    val bench = docFrame(
      (100L, s"$secret in benchmark one $boiler"),
      (101L, s"another item with $boiler inside"),
      (102L, s"also has $boiler too yes"))
    val out = graft.ops.Contamination.screen(train, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 shares the 3 complete 5-grams of the 7-token secret phrase
    assert(out(1L) == (3L, 1L))
    // doc 2 shares boilerplate 5-grams (2 of them) seen in 3 bench docs
    assert(out(2L) == (2L, 3L))
    assert(!out.contains(3L) && !out.contains(4L))
    // capping gram df at 1 kills the boilerplate match but keeps doc 1
    val capped = graft.ops.Contamination.screen(train, bench, "doc_id",
      "text", maxGramDf = Some(1))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(capped == Map(1L -> (3L, 1L)))
  }

  test("incremental near-dup: pairs cross sides only, survivors filter") {
    val refDocs = docFrame(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated reference text about databases and streams"))
    val newDocs = docFrame(
      // one-token edit at the tail: 3-shingle jaccard 7/9 ≈ 0.78, high
      // enough that the 8x4 banding finds the pair under the md5+affine
      // hash family (a mid-0.5s jaccard is genuinely probabilistic at
      // these defaults — that recall curve is the method, not a bug)
      (10L, "the quick brown fox jumps over the lazy dog now"),
      (11L, "novel content alpha beta gamma delta epsilon zeta"),
      (12L, "novel content alpha beta gamma delta epsilon eta"),
      (13L, "completely unrelated reference text about databases and streams"))
    val pairs = Dedup
      .minHashLshAgainstPairs(newDocs, refDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    // exact dup across sides verifies at jaccard 1; near-dup found;
    // the within-batch near-dup pair (11, 12) is NOT this operator's job
    assert(pairs((13L, 2L)) == 1.0)
    assert(pairs.contains((10L, 1L)) && pairs((10L, 1L)) > 0.5)
    assert(!pairs.keySet.exists { case (n, _) => n == 11L || n == 12L })
    val surv = Dedup.nearDupAgainst(newDocs, refDocs, "doc_id", "text",
      minJaccard = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(11L, 12L))
    // cross-side results agree pairwise with the within-corpus operator
    // run on the union (id spaces disjoint here, so the comparison is
    // well-defined)
    val base = Dedup
      .minHashLshPairs(refDocs.unionByName(newDocs), "doc_id", "text")
      .where(col("id1") <= 2L && col("id2") >= 10L)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(3))
      .toMap
    assert(base == pairs)
  }

  test("random corpora: scrubSpans equals a naive reference") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    def randDoc() = Seq.fill(3 + rnd.nextInt(12))(
      vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val w = 3
    (1 to 3).foreach { _ =>
      val train = (1L to 10L).map(i => (i, randDoc()))
      val bench = (101L to 104L).map(i => (i, randDoc()))
      // naive reference: mark every token covered by a window matching
      // any bench gram, rebuild from the survivors
      val benchGrams = bench.flatMap(_._2.split(" ").sliding(w)
        .filter(_.length == w).map(_.mkString(" "))).toSet
      val want = train.map { case (id, t) =>
        val toks = t.split(" ")
        val covered = toks.indices.filter { p =>
          (math.max(0, p - w + 1) to math.min(p, toks.length - w)).exists {
            st => benchGrams.contains(toks.slice(st, st + w).mkString(" "))
          }
        }.toSet
        val kept = toks.indices.filterNot(covered).map(toks)
        (id, (toks.length.toLong, covered.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = graft.ops.Contamination.scrubSpans(
        docFrame(train: _*), docFrame(bench: _*), "doc_id", "text",
        gramWidth = w)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      assert(got == want)
    }
  }

  test("length profile: exact type-1 percentiles from the histogram") {
    def doc(id: Long, k: Int) = (id, Seq.fill(k)("w").mkString(" "))
    // group a: lengths 1..10; group b: [2, 2, 2, 7]
    val rows = (1 to 10).map(i => doc(i.toLong, i)) ++
      Seq(doc(21L, 2), doc(22L, 2), doc(23L, 2), doc(24L, 7))
    val df = docFrame(rows: _*)
      .withColumn("grp", when(col("doc_id") <= 10, "a").otherwise("b"))
    val out = graft.ops.TextOps.lengthProfile(df, "grp", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // a: n=10, sum=55; p50 = smallest len with cum >= 5, p90 -> 9,
    // p99 -> ceil(9.9)=10 -> 10
    assert(out("a") == (10L, 55L, 5L, 9L, 10L))
    // b: n=4, sum=13; p50 -> ceil(2)=2 -> len 2, p90 -> ceil(3.6)=4 -> 7
    assert(out("b") == (4L, 13L, 2L, 7L, 7L))
  }

  test("decontamination scrub removes covered runs, keeps the rest") {
    val secret = "the quick brown fox jumps high today" // 7 tokens
    val train = docFrame(
      (1L, s"intro words $secret and an outro"),  // 12 tokens, 7 covered
      (2L, "totally different text with nothing shared at all"),
      (3L, "tiny doc"),                           // < 5 tokens: untouched
      (4L, secret))                               // fully contaminated
    val bench = docFrame((100L, s"$secret in benchmark one"))
    val out = graft.ops.Contamination
      .scrubSpans(train, bench, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // doc 1: the secret's 3 complete 5-gram windows cover exactly the 7
    // secret tokens (positions 2..8); intro/outro survive in order
    assert(out(1L) == (12L, 7L, "intro words and an outro"))
    assert(out(2L) ==
      (8L, 0L, "totally different text with nothing shared at all"))
    assert(out(3L) == (2L, 0L, "tiny doc"))
    assert(out(4L) == (7L, 7L, ""))
  }

  test("tfidf top-k: self-excluded, lexical overlap ranks first, df cap") {
    import graft.ops.TfIdf
    val corpus = docFrame(
      (0L, "spark shuffles data across executors"),
      (1L, "spark shuffles data between executors"), // near-copy of 0
      (2L, "ducks swim on quiet ponds"),
      (3L, "quiet ponds hold swimming ducks"),
      (4L, "completely unrelated legal boilerplate"))
    val out = TfIdf.topK(corpus.where(col("doc_id") < 2), corpus,
      "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // nearest neighbor of each near-copy is the other one; never itself
    assert(out((0L, 1)) == 1L && out((1L, 1)) == 0L)
    // df cap drops the ubiquitous token but keeps the vectors usable
    val n = corpus.count()
    val uncapped = TfIdf.vectors(corpus, "doc_id", "text", n)
    val capped = TfIdf.vectors(corpus, "doc_id", "text", n, maxDf = Some(1))
    assert(capped.count() < uncapped.count())
    assert(capped.where(col("token") === "spark").count() == 0) // df=2 > 1
  }

  test("plan shapes: no Expand in contamination, three shuffles in spans") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def shuffles(df: org.apache.spark.sql.DataFrame) = {
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      p.collect { case e: ShuffleExchangeExec => e }
    }
    val train = docFrame((1L, "a b c d e f"), (2L, "g h i j k l"))
    val bench = docFrame((9L, "a b c d e z"))
    // the round-5 rework removed the twin-countDistinct Expand: the
    // whole screen plan must stay Expand-free (capped or not)
    Seq(None, Some(5)).foreach { cap =>
      val plan = graft.ops.Contamination
        .screen(train, bench, "doc_id", "text", gramWidth = 3, maxGramDf = cap)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Expand"), s"Expand reappeared (cap=$cap)")
    }
    // spans: doc-window + gram-group + pair-window — exactly 3 exchanges
    val spans = Dedup.duplicateSpans(docFrame((1L, "a b c d"), (2L, "a b c e")),
      "doc_id", "text", gramWidth = 2, minGramRun = 1, maxGramDf = Some(5))
    assert(shuffles(spans).length == 3,
      s"span plan shuffle count changed: ${shuffles(spans).length}")
    // gumbel resample: top-k must plan as TakeOrderedAndProject
    // (per-partition top-k + k-row merge), never a global Sort+Limit
    val res = graft.ops.Dsir.gumbelResample(
      docFrame((1L, "x"), (2L, "y")).withColumn("log_weight", lit(0.0)),
      "doc_id", 1)
    val resPlan = res.queryExecution.executedPlan.toString
    assert(resPlan.contains("TakeOrderedAndProject"), resPlan)
    // exact per-group sampling: the rank filter must push down as
    // WindowGroupLimit so no group ever fully materializes in the window
    val smp = graft.ops.Sampling.sampleExactPerGroup(
      docFrame((1L, "x"), (2L, "y")).withColumn("g", lit("a")),
      "g", "doc_id", 1)
    assert(smp.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
    // in-row LSH index: tokenization must run ONCE per row. The op is a
    // single mapPartitions pass (once-per-row by construction — Catalyst
    // merged the projection chain through the final Generate and fanned
    // the shingle build into all signature lambdas, 33 copies in round
    // 8), so the plan must carry NO expression-level tokenization and
    // exactly one object-map node.
    val idx = Dedup.lshIndexRows(docFrame((1L, "a b c d")).repartition(1),
      "doc_id", "text")
    val nRegex = idx.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect {
        case r: org.apache.spark.sql.catalyst.expressions.RegExpReplace => r
      }.size).sum
    }.sum
    assert(nRegex == 0, s"tokenization fanned out: $nRegex regex nodes")
    val nMapParts = idx.queryExecution.optimizedPlan.collect {
      case m: org.apache.spark.sql.catalyst.plans.logical.MapPartitions => m
    }.size
    assert(nMapParts == 1, s"expected one mapPartitions pass, got $nMapParts")
  }

  test("tokensJvm is the exact twin of the Column tokenizer on " +
      "adversarial strings") {
    // the mapPartitions kernels (lshIndexRows, and any future one) stand
    // on tokensJvm producing byte-identical tokens to the Column chain —
    // probe the divergence candidates: control chars below 0x20 that are
    // not \s (String.trim would strip them, StringTrim must not),
    // unicode whitespace (NOT \s in java.regex default mode), non-ASCII
    // case mapping (Turkish İ, ß), surrogate pairs, empties and nulls
    val rnd = new scala.util.Random(80813)
    val pieces = Vector("word", "İstanbul", "STRASSE", "ß", "Ωmega",
      "😀x", "", "ctl", " ", " ", "tab\there",
      "line\nbreak", "  ", "\r\n", "mIxEd", "ÉCOLE", "ǅungla")
    val strs = Seq("", " ", " a b", "ab", null,
      " lead", "İİ  AB", "ß sharp") ++
      Seq.fill(200)(Seq.fill(1 + rnd.nextInt(8))(
        pieces(rnd.nextInt(pieces.length))).mkString(
          if (rnd.nextBoolean()) " " else "\t "))
    val schema = StructType(Seq(StructField("i", LongType),
      StructField("s", StringType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(strs.zipWithIndex.map { case (s, i) =>
          Row(i.toLong, s) }).asJava), schema)
    val colSide = df.select(col("i"), TextOps.tokens(col("s")).as("t"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
    strs.zipWithIndex.foreach { case (s, i) =>
      val jvm = TextOps.tokensJvm(s).toList
      val c = colSide(i.toLong)
      // Column chain maps null text to null array; tokensJvm to empty —
      // both mean "no tokens" (every consumer filters/flatMaps)
      val cNorm = if (c == null) Nil else c
      assert(cNorm == jvm,
        s"tokenizer divergence on ${Option(s).map(_.map(ch =>
          f"\\u${ch.toInt}%04x").mkString).getOrElse("null")}: " +
          s"column=$cNorm jvm=$jvm")
    }
  }

  test("random corpora: md5+affine minhash matches a naive reference") {
    // independent Scala re-derivation of the full signature arithmetic
    // (md5-prefix base hash, affine permutation, min over the shingle
    // set with the whole-doc fallback) — pins BOTH constructions, the
    // grouped aggregation and the in-row streaming index, against it
    val rnd = new scala.util.Random(20260813)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    def randDoc() = Seq.fill(1 + rnd.nextInt(12))(
      vocab(rnd.nextInt(vocab.length))).mkString("  ") // odd spacing
    def md5p32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    def naiveSigs(text: String, w: Int, numHashes: Int): Seq[Long] = {
      val toks = text.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
      val grams = if (toks.length >= w) toks.sliding(w).map(_.mkString(" ")).toSeq
        else Seq(toks.mkString(" "))
      (0 until numHashes).map { i =>
        val (a, b) = Dedup.minHashParams(i)
        grams.map(g => (md5p32(g) * a + b) % Dedup.MinHashPrime).min
      }
    }
    (1 to 3).foreach { _ =>
      val docs = (1L to 12L).map(i => (i, randDoc()))
      val df = docFrame(docs: _*)
      val got = Dedup.minHashSignatures(df, "doc_id", "text",
        numHashes = 16, shingleWidth = 3).collect()
        .map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
      docs.foreach { case (id, t) =>
        assert(got(id) == naiveSigs(t, 3, 16), s"grouped sigs, doc $id")
      }
      // the in-row (streaming) index derives the same band buckets
      val inRow = Dedup.lshIndexRows(df, "doc_id", "text",
        numHashes = 16, bands = 4, shingleWidth = 3).collect()
        .map(r => (r.getLong(0), r.getInt(3)) -> r.getString(4)).toMap
      docs.foreach { case (id, t) =>
        val sigs = naiveSigs(t, 3, 16)
        (0 until 4).foreach { b =>
          val want = (b * 4 until b * 4 + 4).map(sigs).mkString("|")
          assert(inRow((id, b)) == want, s"in-row bucket, doc $id band $b")
        }
      }
    }
  }

  test("random corpora: 64-bit simhash matches a naive reference") {
    val rnd = new scala.util.Random(7117)
    val vocab = Vector("red", "blue", "green", "ochre", "teal")
    def randDoc() = Seq.fill(1 + rnd.nextInt(15))(
      vocab(rnd.nextInt(vocab.length))).mkString(" ")
    def md5w32(s: String, w: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val o = 4 * w
      ((d(o) & 0xFFL) << 24) | ((d(o + 1) & 0xFFL) << 16) |
        ((d(o + 2) & 0xFFL) << 8) | (d(o + 3) & 0xFFL)
    }
    def naive(text: String, w: Int): Long = {
      val toks = text.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ").filter(_.nonEmpty) // per OCCURRENCE, not distinct
      (0 until 32).map { i =>
        val s = toks.map(t =>
          if (((md5w32(t, w) >> i) & 1L) == 1L) 1 else -1).sum
        if (s > 0) 1L << i else 0L
      }.reduce(_ | _)
    }
    (1 to 3).foreach { _ =>
      val docs = (1L to 15L).map(i => (i, randDoc()))
      val got = Dedup.simHash(docFrame(docs: _*), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      docs.foreach { case (id, t) =>
        assert(got(id) == ((naive(t, 0), naive(t, 1))), s"doc $id")
      }
      // 32-bit legacy width: lo word identical, hi word 0
      val g32 = Dedup.simHash(docFrame(docs: _*), "doc_id", "text", bits = 32)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      docs.foreach { case (id, t) =>
        assert(g32(id) == ((naive(t, 0), 0L)), s"doc $id at 32 bits")
      }
    }
  }

  test("lm perplexity: reference-like text scores lower; math is exact") {
    import graft.ops.LmScore
    val ref = docFrame(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"))
    val model = LmScore.trainBigram(ref, "doc_id", "text")
    assert(model.vocabSize == 7) // the cat sat on mat dog rug
    val cand = docFrame(
      (10L, "the cat sat on the mat"), // every bigram seen
      (11L, "zz qq pp mm"),            // nothing seen
      (12L, "x"))                      // <2 tokens: no score row
    val out = LmScore.scoreDocs(cand, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(12L))
    assert(out(10L)._1 == 5L && out(11L)._1 == 3L)
    assert(out(10L)._2 < out(11L)._2)
    // fully-unseen text: every bigram is the 1/V floor -> log2(V) at the
    // operator's 4dp per-term quantization (log2(7) = 2.80735... -> 2.8074)
    assert(math.abs(out(11L)._2 - 2.8074) < 1e-12)
  }

  test("incremental dedup drops docs whose content exists in the reference") {
    val ref = docFrame((1L, "Hello  World"), (2L, "old news item"))
    val fresh = docFrame(
      (10L, "hello world"),      // normalizes to a reference text -> drop
      (11L, "genuinely new doc"),
      (12L, "OLD   NEWS item")) // also matches after normalization
    val out = Dedup.exactAgainst(fresh, ref, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(11L))
    // empty reference keeps everything; identical reference drops all
    assert(Dedup.exactAgainst(fresh, fresh.limit(0), "doc_id", "text")
      .count() == 3L)
    assert(Dedup.exactAgainst(fresh, fresh, "doc_id", "text").count() == 0L)
  }

  test("duplicate spans: merge, boundaries, multiple islands, df cap") {
    // doc 1/2 share the 6-token run "a b c d e f" (at offset 0 vs 2):
    // with width 3 that is 4 consecutive grams -> one merged span
    val df = docFrame(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f q r"),
      (3L, "a b c z1 z2 z3 z4"))   // shares only the single gram "a b c"
    val out = Dedup.duplicateSpans(df, "doc_id", "text",
      gramWidth = 3, minGramRun = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getLong(5))).toSeq.sorted
    assert(out == Seq((1L, 2L, 0, 2, 4L, 6L)))
    // minGramRun = 1 also surfaces the single-gram overlaps with doc 3
    val loose = Dedup.duplicateSpans(df, "doc_id", "text",
      gramWidth = 3, minGramRun = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
    assert(loose.contains((1L, 3L, 3L)) && loose.contains((2L, 3L, 3L)))

    // two islands on the same diagonal stay two separate spans
    val gap = docFrame(
      (1L, "p q r s GAP1 t u v w"),
      (2L, "p q r s GAP2 t u v w"))
    val spans = Dedup.duplicateSpans(gap, "doc_id", "text",
      gramWidth = 2, minGramRun = 2)
      .collect().map(r => (r.getInt(2), r.getInt(3), r.getLong(5))).toSeq.sorted
    assert(spans == Seq((0, 0, 4L), (5, 5, 4L)))

    // df cap: a run present in 3 docs disappears at cap 2
    val boiler = docFrame(
      (1L, "all rights reserved here"), (2L, "all rights reserved there"),
      (3L, "all rights reserved everywhere"), (4L, "unique text entirely now"))
    def n(cap: Option[Int]) = Dedup.duplicateSpans(boiler, "doc_id", "text",
      gramWidth = 2, minGramRun = 2, maxGramDf = cap).count()
    assert(n(None) == 3L && n(Some(2)) == 0L)

    // occurrence cap: the same boilerplate run (6 total occurrences of
    // each gram across 3 docs) survives at the default cap, disappears
    // when the cap goes below its occurrence count — the pre-aggregation
    // hot-key guard is live semantics, not dead config
    def occ(cap: Int) = Dedup.duplicateSpans(boiler, "doc_id", "text",
      gramWidth = 2, minGramRun = 2, maxGramOccurrences = cap).count()
    assert(occ(1000) == 3L && occ(2) == 0L)
  }

  test("duplicate spans match a naive quadratic reference on random corpora") {
    // tiny alphabet forces heavy gram collisions; the naive reference
    // enumerates doc pairs and merges diagonal runs directly in Scala
    def naiveSpans(ds: Map[Long, IndexedSeq[String]], w: Int, minRun: Int)
        : Set[(Long, Long, Int, Int, Long, Long)] = {
      val grams = ds.map { case (id, toks) =>
        id -> toks.sliding(w).zipWithIndex
          .collect { case (g, i) if g.length == w => (i, g.mkString(" ")) }
          .toSeq
      }
      val out = scala.collection.mutable.Set
        .empty[(Long, Long, Int, Int, Long, Long)]
      for ((id1, g1) <- grams; (id2, g2) <- grams if id1 < id2) {
        val byGram = g2.groupBy(_._2)
        val hits = for {
          (p1, g) <- g1
          (p2, _) <- byGram.getOrElse(g, Nil)
        } yield (p1, p2)
        hits.groupBy { case (p1, p2) => p1 - p2 }.foreach { case (diag, ps) =>
          val sorted = ps.map(_._1).distinct.sorted
          var runStart = 0
          for (i <- sorted.indices) {
            val endOfRun = i == sorted.length - 1 ||
              sorted(i + 1) != sorted(i) + 1
            if (endOfRun) {
              val len = i - runStart + 1
              if (len >= minRun) {
                val s1 = sorted(runStart)
                out += ((id1, id2, s1, s1 - diag, len.toLong,
                  (len + w - 1).toLong))
              }
              runStart = i + 1
            }
          }
        }
      }
      out.toSet
    }
    val vocab = Vector("a", "b", "c")
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { _ =>
      val ds = (1L to 6L).map { id =>
        id -> IndexedSeq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(3)))
      }.toMap
      val df = docFrame(ds.toSeq.sortBy(_._1)
        .map { case (id, t) => (id, t.mkString(" ")) }: _*)
      val got = Dedup.duplicateSpans(df, "doc_id", "text",
        gramWidth = 2, minGramRun = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3), r.getLong(4), r.getLong(5))).toSet
      val want = naiveSpans(ds, w = 2, minRun = 2)
      assert(got == want, s"\ncorpus=$ds\ngot=$got\nwant=$want")
    }
  }

  test("sequence packing: exclusive cumsum, boundaries, shard independence") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // single shard so the layout is fully predictable: docs of 300 tokens
    // pack at seqLen=512 as starts 0,300,600,900 -> packs 0,0,1,1 with
    // offsets 0,300,88,388 (doc 1 straddles the 512 boundary: it STARTS
    // in pack 0; the split is the trainer's concern, not the layout's)
    val df = (0L to 3L).map(i => (i, 300L)).toDF("doc_id", "n_tokens")
    val out = graft.ops.Packing.packSequences(df, "doc_id", "n_tokens",
      seqLen = 512, numShards = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq((0L, 0L), (0L, 300L), (1L, 88L), (1L, 388L)))
    // multiple shards: each shard's packing is independent and dense
    val big = spark.range(200).select(col("id").as("doc_id"),
      (col("id") % 7 * 10 + 5).as("n_tokens"))
    val packed = graft.ops.Packing.packSequences(big, "doc_id", "n_tokens",
      seqLen = 100, numShards = 4)
    packed.groupBy("shard").count().collect().foreach { r =>
      assert(r.getLong(1) > 0)
    }
    // within each shard the first doc starts at pack 0 offset 0, and
    // offsets are always < seqLen
    val firsts = packed.orderBy("doc_id").collect()
      .groupBy(_.getInt(2)).values.map(_.minBy(_.getLong(0)))
    firsts.foreach(r => assert(r.getLong(3) == 0L && r.getLong(4) == 0L))
    packed.collect().foreach(r => assert(r.getLong(4) < 100))
    // deterministic under repartitioning
    val again = graft.ops.Packing.packSequences(big.repartition(13),
      "doc_id", "n_tokens", seqLen = 100, numShards = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3),
        r.getLong(4))).toSeq
    val base = packed.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(again == base)
  }

  test("pipeline queries with internal caches release them (q39/q50)") {
    val dir = "/root/testdata/sf0.001"
    Seq("q39_dedup_groups", "q50_full_pipeline", "q76_neardup_incremental",
      "q83_eval_set").foreach { q =>
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      SparkEntry.queries(q)(spark, dir).count()
      val fresh = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
      // only tiny GC-managed localCheckpoint blocks (edge list / CC
      // labels) may survive — the trigram frame cache must be released
      assert(fresh.size <= 3, s"$q leaked cached RDDs: $fresh")
    }
  }

  test("hash split: total, determinism, proportions, and sampling subset") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(2000).select(col("id").as("doc_id"))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = graft.ops.Sampling.splitByHash(df, "doc_id", splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.values.sum == 2000)
    // deterministic: a second run assigns identically
    val s2 = graft.ops.Sampling.splitByHash(df, "doc_id", splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    // proportions within 4 sigma of the md5-uniform expectation
    assert(math.abs(s1("train") - 1600.0) < 80,  s"train=${s1("train")}")
    assert(math.abs(s1("val") - 200.0) < 60,     s"val=${s1("val")}")
    assert(math.abs(s1("test") - 200.0) < 60,    s"test=${s1("test")}")
    // sampleByHash(f) is the prefix of the same hash order: every sampled
    // id at 0.1 is also sampled at 0.2
    val a = graft.ops.Sampling.sampleByHash(df, "doc_id", 0.1)
      .collect().map(_.getLong(0)).toSet
    val b = graft.ops.Sampling.sampleByHash(df, "doc_id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(b) && a.nonEmpty && b.size > a.size)
  }

  test("simhash: identical docs equal, near docs close, far docs far") {
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (1 to 28).map(i => s"w$i").mkString(" ") + " x1 x2"
    val c = (200 to 230).map(i => s"q$i").mkString(" ")
    val df = docFrame((1L, a), (2L, a), (3L, b), (4L, c))
    val h = Dedup.simHash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h(1L) == h(2L))
    def hamming(x: (Long, Long), y: (Long, Long)) =
      java.lang.Long.bitCount(x._1 ^ y._1) + java.lang.Long.bitCount(x._2 ^ y._2)
    assert(hamming(h(1L), h(3L)) < hamming(h(1L), h(4L)))
    val pairs = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash pairs: 16-bit-chunk blocking is pigeonhole-EXACT at 64 bits") {
    // every hamming<=3 pair a brute-force scan of the 64-bit hashes finds
    // must come back from the chunk-blocked join (numChunks=4 > maxHamming)
    val rnd = new scala.util.Random(40813)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    // planted twins: exact duplicates (hamming 0 — guaranteed pairs) and
    // one-token edits of 60-token docs (a few flipped bits), plus
    // unrelated docs that must NOT pair up
    val docs = (0L until 15L).flatMap { k =>
      val base = Seq.fill(60)(vocab(rnd.nextInt(vocab.length)))
      val twin = if (k % 3 == 0) base else base :+ s"edit$k"
      Seq((2 * k + 1, base.mkString(" ")), (2 * k + 2, twin.mkString(" ")))
    }
    val df = docFrame(docs: _*)
    val h = Dedup.simHash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = (for {
      i <- h.keys; j <- h.keys if i < j
      d = java.lang.Long.bitCount(h(i)._1 ^ h(j)._1) +
        java.lang.Long.bitCount(h(i)._2 ^ h(j)._2)
      if d <= 3
    } yield (i, j, d)).toSet
    assert(want.nonEmpty, "fixture must contain hamming<=3 pairs")
    val got = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    // numChunks must exceed maxHamming or exactness is gone — rejected
    intercept[IllegalArgumentException] {
      Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 4, numChunks = 4)
    }
  }

  test("cosine and brute-force top-k") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def v(xs: Double*) = xs.map(_.toFloat)
    val rows = Seq(
      Row(0L, v(1, 0, 0)), Row(1L, v(0.9, 0.1, 0)), Row(2L, v(0, 1, 0)),
      Row(3L, v(-1, 0, 0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val top = Similarity.bruteForceTopK(
      df.where(col("vec_id") === 0), df, "vec_id", "embedding", 2).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // ranked by cosine
    assert(math.abs(top(0).getDouble(2) - 0.9 / math.sqrt(0.82)) < 1e-9)
  }

  test("url domain extraction handles case, userinfo, ports, queries") {
    val df = docFrame((1L,
      "a https://Site.Example.COM/x?q=1 b http://u:p@host.org:81/y " +
        "c https://bare.net d no url here"))
    val got = graft.ops.TextOps.domainRows(df, "doc_id", "text")
      .collect().map(r => r.getString(1)).sorted.toSeq
    assert(got == Seq("bare.net", "host.org", "site.example.com"))
    // a doc with no URLs contributes no rows
    assert(graft.ops.TextOps
      .domainRows(docFrame((2L, "plain text")), "doc_id", "text")
      .count() == 0L)
  }

  test("magic-byte sniffing detects every signature and the fallback") {
    val cases: Seq[(String, Array[Byte])] = Seq(
      "image/png" -> (Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte) ++ "body".getBytes),
      "image/jpeg" -> (Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++
        "body".getBytes),
      "image/gif" -> "GIF89a-body".getBytes,
      "audio/wav" -> ("RIFF".getBytes ++ Array[Byte](1, 2, 3, 4) ++
        "WAVEbody".getBytes),
      "video/mp4" -> (Array[Byte](0, 0, 0, 0x18) ++ "ftypmp42".getBytes),
      "application/pdf" -> "%PDF-1.7 body".getBytes,
      "application/octet-stream" -> "plain text".getBytes,
      // a TEXT payload with 'ftyp' at chars 4-7 must NOT sniff as mp4:
      // the box-length anchor (leading NULs) rejects printable text
      "application/octet-stream" -> "#docftyp looks like a box".getBytes)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rows = cases.zipWithIndex.map { case ((_, b), i) => Row(i.toLong, b) }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val got = df.select(col("id"),
        graft.ops.Multimodal.sniffMime(col("payload")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((want, _), i) =>
      assert(got(i.toLong) == want, s"case $i")
    }
  }

  test("compression ratio separates repetitive from diverse text") {
    val rep = "buy cheap " * 100
    val div = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val df = docFrame((1L, rep), (2L, div), (3L, ""))
    val got = graft.ops.TextOps
      .withCompressionRatio(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).get < 0.1, s"repetitive: ${got(1L)}")
    assert(got(2L).get > got(1L).get * 3, s"diverse: ${got(2L)}")
    assert(got(3L).isEmpty)
    // deterministic across partitionings
    val again = graft.ops.TextOps
      .withCompressionRatio(df.repartition(3), "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(again == got)
  }

  test("jsonl/csv ingest quarantines malformed lines, keeps the rest") {
    import spark.implicits._
    val tmp = tmpDir("graft_input").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", StringType)))
    Seq("""{"id": 1, "t": "hello"}""", "garbage line",
      """{"id": 2, "t": "world", "extra": true}""").toDS().coalesce(1)
      .write.mode("overwrite").text(tmp + "/j")
    val rj = graft.ops.Input.readJsonl(spark, tmp + "/j", schema)
      .localCheckpoint(true)
    val (goodJ, badJ) = graft.ops.Input.quarantine(rj)
    // extra fields ignored; malformed line quarantined verbatim
    assert(goodJ.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "hello"), (2L, "world")))
    assert(badJ.collect().map(_.getString(0)).toSeq == Seq("garbage line"))

    Seq("id,t", "1,hello", "not,a,valid,row,with,extra", "2,world")
      .toDS().coalesce(1).write.mode("overwrite").text(tmp + "/c")
    val rc = graft.ops.Input.readCsv(spark, tmp + "/c", schema)
      .localCheckpoint(true)
    val (goodC, badC) = graft.ops.Input.quarantine(rc)
    assert(goodC.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "hello"), (2L, "world")))
    assert(badC.count() == 1L)
  }

  test("random projection: one-hot rows read the matrix back exactly") {
    val dim = 16; val outDim = 4
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = (0 until dim).map(i =>
      Row(i.toLong, Seq.tabulate(dim)(d => if (d == i) 1.0f else 0.0f)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val got = Similarity.randomProject(df, "vec_id", "embedding", outDim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // projecting e_i yields column i of the matrix times 1/sqrt(outDim),
    // EXACTLY (the fold adds only zeros around the one term)
    val coefs = Similarity.planeCoefs(outDim, dim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    (0 until dim).foreach { i =>
      val want = (0 until outDim).map(j => coefs(j)(i) * scale)
      assert(got(i.toLong) == want, s"one-hot $i")
    }
  }

  test("int8 quantization: exact codes, half-up rounding, ranking intact") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def v(xs: Double*) = xs.map(_.toFloat)
    val rows = Seq(
      Row(0L, v(1, 0, 0)), Row(1L, v(0.9, 0.1, 0)), Row(2L, v(0, 1, 0)),
      Row(3L, v(0.5, -1.0, 0.25)), Row(4L, v(0, 0, 0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val qz = Similarity.quantizeInt8(df, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2)))
      .toMap
    // scale = max|x|/127; 0.5/(1/127) = 63.5 rounds HALF-UP to 64
    assert(qz(3L)._2 == Seq(64, -127, 32))
    assert(math.abs(qz(3L)._1 - 1.0 / 127) < 1e-12)
    // zero vector: scale 0, all-zero codes (not NaN)
    assert(qz(4L) == (0.0, Seq(0, 0, 0)))
    // quantized ranking matches exact brute force on separated vectors
    val top = Similarity.quantizedTopK(df.where(col("vec_id") === 0),
      df.where(col("vec_id") < 4), "vec_id", "embedding", 2).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 3L))
  }

  test("ann top-k recalls the exact top neighbor on clustered vectors") {
    // two tight clusters: LSH buckets must separate them
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Array(10.0, 0.0, 1.0) else Array(-10.0, 1.0, -1.0)
      Row(i.toLong, base.zipWithIndex.map { case (x, d) =>
        (x + 0.01 * i * (d + 1)).toFloat }.toSeq)
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val exact = Similarity.bruteForceTopK(
      df.where(col("vec_id") === 0), df, "vec_id", "embedding", 1).collect()
    val ann = Similarity.annTopK(
      df.where(col("vec_id") === 0), df, "vec_id", "embedding", 1, planes = 4)
      .collect()
    assert(ann.nonEmpty && ann.head.getLong(1) == exact.head.getLong(1))
  }

  test("ivf top-k recalls the exact top neighbor on clustered vectors") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = (0 until 40).map { i =>
      val base = (i % 4) match {
        case 0 => Array(10.0, 0.0, 0.0)
        case 1 => Array(0.0, 10.0, 0.0)
        case 2 => Array(0.0, 0.0, 10.0)
        case _ => Array(-10.0, -10.0, 0.0)
      }
      Row(i.toLong, base.zipWithIndex.map { case (x, d) =>
        (x + 0.05 * i + 0.01 * d).toFloat }.toSeq)
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val qs = df.where(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(qs, df, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(qs, df, "vec_id", "embedding", 1,
      nlist = 4, iters = 2, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // with 4 clear clusters and nprobe=2, recall@1 should be total
    assert(ivf == exact, s"ivf=$ivf exact=$exact")
  }

  test("mipsTopK: planes=1 probes every bucket -> exact inner-product " +
      "top-k; big-norm item beats nearer-angle small-norm item") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // query 0 = [1, 0, 0]. Item 1 is PERFECTLY aligned but tiny
    // (dot 0.5); item 2 is 45-degrees off but huge (dot 7.07). Cosine
    // ranking puts 1 first; MIPS must put 2 first. Items 3.. are noise.
    val rows = Seq(
      Row(0L, Seq(1.0f, 0.0f, 0.0f)),
      Row(1L, Seq(0.5f, 0.0f, 0.0f)),
      Row(2L, Seq(10.0f, 10.0f, 0.0f)),
      Row(3L, Seq(-3.0f, 2.0f, 1.0f)),
      Row(4L, Seq(0.0f, 4.0f, 4.0f)),
      Row(5L, Seq(2.0f, -1.0f, 3.0f)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val qs = df.where(col("vec_id") === 0)
    // planes=1: own bucket + the single flip = the whole space, so the
    // candidate set is total and the result must equal brute force
    val got = Similarity.mipsTopK(qs, df, "vec_id", "embedding", k = 5,
        planes = 1)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    val vecs = rows.map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble)).toMap
    val brute = vecs.filterNot(_._1 == 0L)
      .map { case (id, v) =>
        (id, v.zip(vecs(0L)).map { case (a, b) => a * b }.sum)
      }.toSeq.sortBy { case (id, d) => (-d, id) }
    assert(got.map(_._1).toSeq == brute.map(_._1), s"got ${got.toSeq}")
    got.zip(brute).foreach { case ((_, gd), (_, bd)) =>
      assert(math.abs(gd - bd) < 1e-9) }
    // the MIPS-defining inversion: huge-norm item 2 outranks aligned 1
    assert(got.head._1 == 2L)
    assert(got.map(_._1).indexOf(2L) < got.map(_._1).indexOf(1L))
  }

  /** Real corpus + one planted near-duplicate per query vector: twin id =
    * id + 100000, twin vector = vector with small deterministic per-dim
    * noise (cosine ≥ ~0.99 to its source). The planted twin IS each
    * query's exact nearest neighbor, so "does the method retrieve it" is
    * a meaningful absolute quality floor — unlike top-10 recall on this
    * near-random synthetic corpus, where the "true" neighbors sit at
    * cosine ≈ 0.4 with no bucket structure to exploit (measured LSH
    * recall ≈ 0.24 there — better than the 0.11 random-coverage
    * baseline, but not a stable floor to pin).
    */
  private def plantedCorpus(): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = e.where(col("vec_id") < 20)
    val twins = qs.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => x + (i % 5).cast("double") * 0.003).as("embedding"))
    (qs, e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
      .unionByName(twins))
  }

  test("retrieval quality: lsh/ivf/quantized find planted near-duplicates") {
    // determinism pins prove the approximate family is reproducible; this
    // pins that it is also GOOD: each query's planted twin (cosine ≈ 1)
    // must be retrieved at rank 1 — the near-dup retrieval contract the
    // pipeline actually relies on. A hash/bucket/quantizer regression
    // that wrecks retrieval quality fails these floors.
    val (qs, corpus) = plantedCorpus()
    def twinRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val top1 = df.where(col("rank") === 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      (0L until 20L).count(q => top1.get(q).contains(q + 100000L)) / 20.0
    }
    val rQuant = twinRecall(Similarity.quantizedTopK(qs, corpus,
      "vec_id", "embedding", k = 1))
    assert(rQuant == 1.0, s"quantized twin recall@1 = $rQuant")
    val rLsh = twinRecall(Similarity.annTopK(qs, corpus,
      "vec_id", "embedding", k = 1, planes = 6))
    assert(rLsh >= 0.9, s"lsh twin recall@1 = $rLsh")
    val rIvf = twinRecall(Similarity.ivfTopK(qs, corpus,
      "vec_id", "embedding", k = 1, nlist = 16, iters = 2, nprobe = 4))
    assert(rIvf >= 0.9, s"ivf twin recall@1 = $rIvf")
  }

  test("PQ/ADC: packed codes decode and planted twins retrieved at rank 1") {
    val (qs, corpus) = plantedCorpus()
    val (codes, books) = Similarity.pqTrain(corpus, "vec_id", "embedding")
    assert(books.length == 8 && books.forall(_.length == 16))
    // the packed 32-bit code decodes back to the 8 sub-codes
    codes.limit(10).collect().foreach { r =>
      val code = r.getAs[Long]("code")
      (0 until 8).foreach { j =>
        assert(((code / math.pow(16, j).toLong) % 16).toInt ==
          r.getAs[Int](s"__c$j"), s"subcode $j of packed $code")
      }
    }
    // a near-identical twin lands in the same cells of every subspace
    // codebook, so ADC must put it at rank 1 — the retrieval floor on
    // 4-byte codes (the raw vectors are never read at query time)
    val top1 = Similarity.pqTopK(qs, corpus, "vec_id", "embedding", k = 1)
      .where(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rec = (0L until 20L).count(q =>
      top1.get(q).contains(q + 100000L)) / 20.0
    assert(rec >= 0.9, s"pq twin recall@1 = $rec")
  }

  test("PQ/IVF-PQ serve plan size is FLAT in |queries| (r17 verdict: the " +
      "old shape unioned one plan branch per query row)") {
    val (_, corpus) = plantedCorpus()
    def queriesOf(n: Int) = corpus.limit(n)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    def planNodes(df: org.apache.spark.sql.DataFrame): Int = {
      var c = 0
      df.queryExecution.optimizedPlan.foreach(_ => c += 1)
      c
    }
    val pq2 = planNodes(Similarity.pqServe(queriesOf(2), corpus,
      "vec_id", "embedding", k = 1))
    val pq40 = planNodes(Similarity.pqServe(queriesOf(40), corpus,
      "vec_id", "embedding", k = 1))
    assert(pq2 == pq40, s"pqServe plan grew with |queries|: $pq2 -> $pq40")
    val ivf2 = planNodes(Similarity.ivfPqServe(queriesOf(2), corpus,
      "vec_id", "embedding", k = 1, nprobe = 2))
    val ivf40 = planNodes(Similarity.ivfPqServe(queriesOf(40), corpus,
      "vec_id", "embedding", k = 1, nprobe = 2))
    assert(ivf2 == ivf40,
      s"ivfPqServe plan grew with |queries|: $ivf2 -> $ivf40")
    // …and the one join is BROADCAST-shaped (pqServe: the compact codes
    // broadcast under a nested-loop cross score with the queries
    // streamed, so each query's candidates stay in one partition and
    // the partial top-k prunes before the rank shuffle — r19 flip;
    // ivfPqServe: broadcast hash of the LUT side on list_id), never a
    // per-query-set shuffle of the corpus
    val pqPlan = Similarity.pqServe(queriesOf(5), corpus, "vec_id",
      "embedding", k = 1).queryExecution.executedPlan.toString
    assert(pqPlan.contains("BroadcastNestedLoopJoin"),
      s"pqServe LUT join not broadcast:\n$pqPlan")
    val ivfPlan = Similarity.ivfPqServe(queriesOf(5), corpus, "vec_id",
      "embedding", k = 1, nprobe = 2).queryExecution.executedPlan.toString
    assert(ivfPlan.contains("BroadcastHashJoin"),
      s"ivfPqServe LUT join not broadcast-hash:\n$ivfPlan")
  }

  test("IVF-PQ: residual index retrieves planted twins through probed lists") {
    val (qs, corpus) = plantedCorpus()
    // a twin differs by per-dim noise ≤ 0.012, so it shares the query's
    // coarse list (probed first — it is the query's nearest centroid)
    // and its residual PQ-encodes into the same cells: rank 1 through
    // the full coarse→residual-code→ADC path
    val top1 = Similarity.ivfPqTopK(qs, corpus, "vec_id", "embedding",
      k = 1, nprobe = 4)
      .where(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rec = (0L until 20L).count(q =>
      top1.get(q).contains(q + 100000L)) / 20.0
    assert(rec >= 0.9, s"ivf-pq twin recall@1 = $rec")
  }

  test("semantic dedup quality: precision 1.0, planted twins recovered") {
    val (_, corpus) = plantedCorpus()
    val v = col("embedding").cast("array<double>")
    // ground truth: ALL pairs at or above the threshold, brute force
    val b = corpus.select(col("vec_id"), v.as("__v"))
    val exact = b.select(col("vec_id").as("id1"), col("__v").as("__v1"))
      .join(b.select(col("vec_id").as("id2"), col("__v").as("__v2")),
        col("id1") < col("id2"))
      .where(Similarity.cosine(col("__v1"), col("__v2")) >= 0.95)
      .select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20) // the 20 planted twin pairs are in there
    val found = graft.ops.Dedup.semanticDedupPairs(corpus, "vec_id",
      "embedding", minCosine = 0.95, nlist = 16, iters = 2)
      .select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is 1.0 by construction (within-cluster pairs re-verify
    // with exact cosine) — assert it stays that way
    assert(found.subsetOf(exact), s"false positives: ${found -- exact}")
    // recall: k-means must put semantic near-dups (cosine ≥ 0.95 — the
    // SemDeDup regime) in one cluster; weak pairs split across clusters
    // are the method's documented recall bound, strong pairs are not
    val rec = exact.intersect(found).size.toDouble / exact.size
    assert(rec >= 0.9, s"semantic-dedup pair recall = $rec of ${exact.size}")
  }

  test("ivfTopK leaves no cached RDDs behind") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = (0 until 12).map(i =>
      Row(i.toLong, Seq((i % 3).toFloat, 1f, (i % 2).toFloat)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Similarity.ivfTopK(df.where(col("vec_id") < 2), df, "vec_id",
      "embedding", 2, nlist = 2, iters = 2, nprobe = 2).count()
    val fresh = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(fresh.isEmpty, s"leaked cached RDDs: $fresh")
  }

  test("text ops: tokens, ratios, langid, fingerprints") {
    val df = docFrame(
      (1L, "The cat and the dog, in the house!"),
      (2L, "el perro y la casa de la gente"),
      (3L, ""))
    val out = df.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("tc"),
      TextOps.langId(col("text")).as("lang"),
      TextOps.punctRatio(col("text")).as("pr")).orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 8)
    assert(out(0).getString(2) == "en")
    assert(out(1).getString(2) == "es")
    assert(out(2).getInt(1) == 0)
    assert(math.abs(out(0).getDouble(3) - 2.0 / 34) < 1e-12)
    // fingerprint is stable and insensitive to outer whitespace
    val fp = docFrame((1L, "stable text body"), (2L, "  stable   text body "))
      .select(TextOps.contentHash(col("text"))).collect()
    assert(fp(0).getLong(0) == fp(1).getLong(0))
  }

  test("token/stopword primitives: engine-portable semantics on " +
      "degenerate and Unicode text") {
    // tokenCount = number of non-whitespace runs: boundary whitespace of
    // any kind adds nothing, whitespace-only and empty count 0, non-BMP
    // code points are ordinary non-whitespace
    val df = docFrame(
      (1L, "  a\tb\nc  "), (2L, "\t \n"), (3L, ""), (4L, "😀 hi"))
    val tc = df.select(col("doc_id"), TextOps.tokenCount(col("text")))
      .orderBy("doc_id").collect().map(_.getInt(1))
    assert(tc.toSeq == Seq(3, 0, 0, 2))
    // stopwordCount counts [a-z]+ runs equal to a listed word — identical
    // in Java and RE2 (unlike \b on NFD text). A combining mark breaks a
    // run the same way punctuation does; case-folding still applies.
    val sw = docFrame(
      (1L, "the,and;of"),              // punctuation-separated runs: 3 hits
      (2L, "de\u0301ja\u0300 the"),   // NFD deja-vu: runs de/ja/the -> "the"
      (3L, "THE And oF"),              // lowercased before matching: 3
      (4L, "their of-topic and2"))     // "their" never matches; "of-topic"
                                       // splits to of+topic and the digit
                                       // ends "and2"'s letter run at "and"
      .select(col("doc_id"), TextOps.stopwordCount(col("text")))
      .orderBy("doc_id").collect().map(_.getInt(1))
    assert(sw.toSeq == Seq(3, 1, 3, 2))
  }

  test("classifier floors: langId and quality gate score >= 0.9 on a " +
      "labeled fixture") {
    // the synthetic corpus's lang column is independent of its text (all
    // docs are English-ish jargon), so absolute accuracy is pinned on a
    // PLANTED fixture of genuine sentences — 10 per language, including
    // low-stopword and cross-language-ambiguous ones ("la" is in both the
    // es and fr profiles), plus junk that must land on "und"
    val en = Seq(
      "the weather is cold and the streets are quiet in that part of town",
      "it is hard to say what the outcome of the vote will be",
      "the report shows that inflation is slowing in most of the region",
      "she walked to the station and waited for the morning train",
      "the committee agreed that the plan needs more work before approval",
      "a cup of coffee in the morning is all that he asked for",
      "the river rises in spring when the snow melts in the mountains",
      "the teacher explained that the exam covers all of the material",
      "it rained for days and the fields turned to mud near the farm",
      "the library is open late during the week of final exams")
    val es = Seq(
      "el mercado abre temprano y los vendedores preparan la fruta que venden",
      "la ciudad tiene una plaza grande donde los vecinos pasean por la tarde",
      "el gobierno anunció que los precios de la energía bajarán este año",
      "una tormenta cruzó la costa y los barcos volvieron al puerto",
      "los estudiantes dicen que la biblioteca cierra demasiado temprano",
      "el tren sale de la estación y llega a la capital por la noche",
      "la receta lleva harina huevos y una taza de azúcar",
      "el museo guarda una colección de arte que atrae a los turistas",
      "las calles del barrio viejo son estrechas y la gente camina despacio",
      "el médico dijo que una dieta sana ayuda a los pacientes")
    val fr = Seq(
      "le marché ouvre tôt et les vendeurs installent des fruits dans la rue",
      "la ville est calme le matin et les cafés ouvrent une heure plus tard",
      "le rapport montre que la croissance est faible dans une partie des régions",
      "les enfants jouent dans le parc et une fanfare passe dans la rue",
      "le train part de la gare et arrive dans la soirée",
      "la bibliothèque est ouverte et les étudiants travaillent dans le calme",
      "une tempête est passée sur la côte et des bateaux sont restés au port",
      "le musée présente une collection qui attire des visiteurs dans la ville",
      "la recette demande de la farine des œufs et une tasse de sucre",
      "le médecin explique que la marche est bonne dans la plupart des cas")
    val de = Seq(
      "der markt öffnet früh und die händler stellen das obst nicht in die sonne",
      "die stadt ist ruhig und ein bus fährt mit wenigen gästen durch das zentrum",
      "der bericht zeigt dass die preise mit dem jahr nicht weiter steigen",
      "die kinder spielen im park und ein zug fährt das tal entlang",
      "der zug verlässt den bahnhof und ist mit etwas verspätung angekommen",
      "die bibliothek ist offen und das licht brennt bis in die nacht",
      "ein sturm zog über die küste und die boote blieben im hafen",
      "das museum zeigt eine sammlung die mit alten karten beginnt",
      "das rezept braucht mehl eier und ein glas milch und ist nicht schwer",
      "der arzt sagt dass bewegung mit dem alter wichtig ist und nicht schadet")
    val junk = Seq(
      "8812-44 #tag $$$ 9x 77~~ (((", "0101 0110 1100 0011 1010",
      "zzz qqq xxx vvv kkk", ">>> ??? !!! ***")
    val labeled = (en.map(_ -> "en") ++ es.map(_ -> "es") ++
      fr.map(_ -> "fr") ++ de.map(_ -> "de") ++ junk.map(_ -> "und"))
      .zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("label", StringType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(labeled.map { case (i, t, l) => Row(i, t, l) }).asJava),
      schema)
    val got = df.select(col("label"),
      TextOps.langId(col("text")).as("pred")).collect()
    val acc = got.count(r => r.getString(0) == r.getString(1)).toDouble /
      got.length
    assert(acc >= 0.9, s"langId accuracy $acc < 0.9 on the labeled fixture " +
      s"(misses: ${got.filter(r => r.getString(0) != r.getString(1))
        .map(_.toSeq).toSeq})")
    // quality gate: genuine prose above 0.5, junk below — same floor.
    // en docs are in-distribution for the en-stopword score; junk is
    // digit/punct noise with no stopwords
    val gated = docFrame(
      (en.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        junk.zipWithIndex.map { case (t, i) => (100L + i, t) }): _*)
      .select(col("doc_id"), (TextOps.qualityScore(col("text")) > 0.5)
        .as("kept")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val qAcc = (en.indices.count(i => gated(i.toLong)) +
      junk.indices.count(i => !gated(100L + i))).toDouble /
      (en.size + junk.size)
    assert(qAcc >= 0.9, s"quality-gate accuracy $qAcc < 0.9")
  }

  test("multimodal stub decode: schema, determinism, plans") {
    val media = docFrame((0L, "aaa"), (1L, "bbbb"), (2L, "ccccc"))
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") === 0, "image/png")
          .when(col("doc_id") === 1, "video/mp4").otherwise("audio/wav").as("mime"),
        col("text").cast("binary").as("payload"))
    val dec = Multimodal.stubDecode(media)
    val rows = dec.orderBy("media_id").collect()
    assert(dec.columns.toSeq == Seq("media_id", "mime", "payload",
      "n_bytes", "width", "height", "n_frames", "sample_rate"))
    assert(rows.map(_.getAs[Long]("n_bytes")).toSeq == Seq(3L, 4L, 5L))
    val img = rows(0)
    assert(img.getAs[Int]("width") >= 16 && img.getAs[Int]("n_frames") == 1)
    assert(rows(1).getAs[Int]("n_frames") >= 1) // video
    assert(rows(2).getAs[Int]("sample_rate") > 0) // audio
    // deterministic: same payload → same probe
    val again = Multimodal.stubDecode(media).orderBy("media_id").collect()
    def cmp(rs: Array[Row]) = rs.map(_.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case x => x
    }).toSeq
    assert(cmp(again) == cmp(rows))
    // resize preserves aspect ratio within bounds
    val rs = Multimodal.resizePlan(dec.where(col("mime") === "image/png"), 100, 100)
      .select("width", "height", "out_width", "out_height").collect()(0)
    assert(rs.getInt(2) <= 100 && rs.getInt(3) <= 100)
    val fs = Multimodal.frameSamplePlan(dec.where(col("mime") === "video/mp4"), 10)
      .select(size(col("sampled_frames"))).collect()(0).getInt(0)
    assert(fs >= 1)
  }

  test("wav decode: real byte parse, extra chunks, and quarantine") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val good = Multimodal.synthWavBytes(7L)
    // same audio with an extra LIST chunk between fmt and data: the
    // chunk walk must skip unknown chunks by declared size
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val withList = good.take(36) ++ listChunk ++ good.drop(36)
    val patched = withList.clone()
    val newRiffLen = withList.length - 8
    patched(4) = (newRiffLen & 0xFF).toByte
    patched(5) = ((newRiffLen >> 8) & 0xFF).toByte
    val rows = Seq(
      (1L, good), (2L, patched),
      (3L, "not a wav at all".getBytes("US-ASCII")),
      (4L, good.take(20)),                     // truncated mid-fmt
      (5L, null.asInstanceOf[Array[Byte]]))
    val schema = StructType(Seq(StructField("media_id", LongType, false),
      StructField("payload", BinaryType, true)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (i, p) => Row(i, p) }).asJava), schema)
    val out = Multimodal.decodeWav(df).orderBy("media_id").collect()
    // id 7 synth: n = 64 + 7%32 = 71, rate = 8000*(1+7%3) = 16000
    val g = out(0)
    assert(g.getInt(2) == 16000 && g.getInt(3) == 1 && g.getInt(4) == 16)
    assert(g.getLong(5) == 71L && g.getLong(6) == 71L * 1000 / 16000)
    val expSum = (0 until 71).map(i => math.abs((7 * 31 + i * 7) % 2048 - 1024)).sum
    assert(g.getLong(8) == expSum)
    // unknown chunk skipped: identical features
    assert(out(1).toSeq.drop(2) == g.toSeq.drop(2))
    // malformed/truncated/null payloads quarantine as all-null features
    Seq(2, 3, 4).foreach { i =>
      assert((2 to 8).forall(out(i).isNullAt), s"row $i not quarantined")
    }
  }

  test("wav activity: silence/clip counts and runs match the closed-form scan") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val rows = Seq(
      (7L, Multimodal.synthWavBytes(7L)),
      (12L, Multimodal.synthWavBytes(12L)),   // grazes the silence band
      (60L, Multimodal.synthWavBytes(60L)),   // ramp wraps through clipping
      (99L, "garbage".getBytes("US-ASCII")),
      (100L, null.asInstanceOf[Array[Byte]]))
    val schema = StructType(Seq(StructField("media_id", LongType, false),
      StructField("payload", BinaryType, true)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (i, p) => Row(i, p) }).asJava), schema)
    val out = Multimodal.wavActivity(df).orderBy("media_id").collect()
    // independent scalar replay of the synth closed form
    def expect(id: Long): (Long, Long, Long, Long, Long) = {
      val n = (64 + id % 32).toInt
      val as = (0 until n).map(i => math.abs((id * 31 + i * 7) % 2048 - 1024))
      val silent = as.count(_ < 128).toLong
      val clipped = as.count(_ >= 1000).toLong
      var run, maxRun = 0L
      as.foreach { a =>
        if (a < 128) { run += 1; maxRun = math.max(maxRun, run) }
        else run = 0
      }
      val lead = as.takeWhile(_ < 128).length.toLong
      (n.toLong, silent, clipped, maxRun, lead)
    }
    Seq(0 -> 7L, 1 -> 12L, 2 -> 60L).foreach { case (idx, id) =>
      val e = expect(id)
      val r = out(idx)
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)) == ((e._1, e._2, e._3, e._4, e._5)))
    }
    // sanity: the fixture actually exercises both gates somewhere
    assert(out.take(3).map(_.getLong(3)).sum > 0, "some silence")
    assert(out.take(3).map(_.getLong(4)).sum > 0, "some clipping")
    Seq(3, 4).foreach { i =>
      assert((2 to 6).forall(out(i).isNullAt), s"row $i not quarantined")
    }
  }

  test("bmp decode: row padding, top-down images, and quarantine") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    // id 9: w = 4+9%8 = 5 (rowBytes 16, real padding), h = 3+9%5 = 7
    val good = Multimodal.synthBmpBytes(9L)
    // top-down variant: negate height, reverse file row order — channel
    // sums must be identical (order-independent)
    val w = 5; val h = 7; val rowBytes = 16
    val topDown = good.clone()
    val negH = -h
    topDown(22) = (negH & 0xFF).toByte
    topDown(23) = ((negH >> 8) & 0xFF).toByte
    topDown(24) = ((negH >> 16) & 0xFF).toByte
    topDown(25) = ((negH >> 24) & 0xFF).toByte
    (0 until h).foreach { fy =>
      System.arraycopy(good, 54 + (h - 1 - fy) * rowBytes,
        topDown, 54 + fy * rowBytes, rowBytes)
    }
    val rows = Seq(
      (1L, good), (2L, topDown),
      (3L, "BMnot really a bitmap".getBytes("US-ASCII")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val schema = StructType(Seq(StructField("media_id", LongType, false),
      StructField("payload", BinaryType, true)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (i, p) => Row(i, p) }).asJava), schema)
    val out = Multimodal.decodeBmp(df).orderBy("media_id").collect()
    val g = out(0)
    assert(g.getInt(2) == w && g.getInt(3) == h && g.getInt(4) == 24)
    assert(g.getLong(5) == w.toLong * h)
    val expR = (for (x <- 0 until w; y <- 0 until h)
      yield (9L + 2 * x + 5 * y) % 256).sum
    assert(g.getLong(6) == expR)
    // top-down: same dims and sums except the height sign is absorbed
    assert(out(1).toSeq.drop(2) == g.toSeq.drop(2))
    Seq(2, 3).foreach { i =>
      assert((2 to 8).forall(out(i).isNullAt), s"row $i not quarantined")
    }
  }

  test("adversarial-media band: giant lying sizes quarantine (the " +
      "32-bit overflow guards), zero-sample and structural edges decode") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val B = Multimodal.AdvMediaBase
    val wav = (0 until 5).map(v => (B + v, Multimodal.synthWavBytes(B + v)))
    val bmp = (0 until 5).map(v => (B + v, Multimodal.synthBmpBytes(B + v)))
    val schema = StructType(Seq(StructField("media_id", LongType, false),
      StructField("payload", BinaryType, true)))
    def df(rows: Seq[(Long, Array[Byte])]) = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (i, p) => Row(i, p) }).asJava), schema)
    val w = Multimodal.decodeWav(df(wav)).orderBy("media_id").collect()
    // v0 truncated, v1 GIANT lying chunk size (pre-fix: off+8+size
    // wrapped negative in 32 bits and the walk threw out of the
    // quarantine), v3 non-PCM → all-null
    Seq(0, 1, 3).foreach { v =>
      assert((2 to 8).forall(w(v).isNullAt), s"wav v$v not quarantined") }
    // v2 zero-sample VALID clip: 8 kHz mono, zero counts — NOT null
    assert(w(2).getInt(2) == 8000 && w(2).getLong(5) == 0L &&
      w(2).getLong(8) == 0L)
    // v4 odd-junk-chunk edge decodes exactly like the normal formula
    val id4 = B + 4
    val n4 = (64 + id4 % 32).toInt
    assert(w(4).getInt(2) == (8000 * (1 + id4 % 3)).toInt)
    assert(w(4).getLong(5) == n4.toLong)
    val expSum = (0 until n4)
      .map(i => math.abs((id4 * 31 + i * 7) % 2048 - 1024)).sum
    assert(w(4).getLong(8) == expSum)
    val b = Multimodal.decodeBmp(df(bmp)).orderBy("media_id").collect()
    // v0 truncated, v1 bad magic, v2 GIANT DIMS (pre-fix: w·3 wrapped
    // negative and the row scan threw), v3 32bpp → all-null
    Seq(0, 1, 2, 3).foreach { v =>
      assert((2 to 8).forall(b(v).isNullAt), s"bmp v$v not quarantined") }
    // v4 top-down edge: standard dims and channel sums at this id
    val w4 = (4 + id4 % 8).toInt
    val h4 = (3 + id4 % 5).toInt
    assert(b(4).getInt(2) == w4 && b(4).getInt(3) == h4)
    val expR = (for (x <- 0 until w4; y <- 0 until h4)
      yield (id4 + 2 * x + 5 * y) % 256).sum
    assert(b(4).getLong(6) == expR)
    // the hash kernels hold the same line: null for 0-3, real for 4
    val ah = Multimodal.aHashBmp(df(bmp)).orderBy("media_id").collect()
    Seq(0, 1, 2, 3).foreach(v =>
      assert(ah(v).isNullAt(4), s"ahash v$v not quarantined"))
    assert(!ah(4).isNullAt(4))
    val eh = Multimodal.envelopeHashWav(df(wav)).orderBy("media_id").collect()
    Seq(0, 1, 2, 3).foreach(v =>
      assert(eh(v).isNullAt(4), s"envhash v$v not quarantined"))
    assert(!eh(4).isNullAt(4))
  }

  test("aHash: identical bytes hash identically, JVM grid reference " +
      "matches, quarantine holds") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val rows = Seq(
      (1L, Multimodal.synthBmpBytesShifted(6L, 0)),
      (2L, Multimodal.synthBmpBytesShifted(6L, 0)), // byte-identical copy
      (3L, Multimodal.synthBmpBytesShifted(6L, 8)), // brightness shifted
      (4L, "BMjunk".getBytes("US-ASCII")),
      (5L, null.asInstanceOf[Array[Byte]]))
    val schema = StructType(Seq(StructField("media_id", LongType, false),
      StructField("payload", BinaryType, true)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (i, p) => Row(i, p) }).asJava), schema)
    val out = Multimodal.aHashBmp(df)
      .select("media_id", "width", "height", "hash_hi", "hash_lo")
      .orderBy("media_id").collect()
    // independent reference: the 8x8 grid over the closed-form pixels
    val (w, h) = (4 + 6 % 8, 3 + 6 % 5) // 10 x 4
    def gridHash(delta: Int): (Long, Long) = {
      val gray = for (j <- 0 until 8; i <- 0 until 8) yield {
        val (sx, sy) = (i * w / 8, j * h / 8)
        val r = math.min((6L + 2 * sx + 5 * sy) % 256 + delta, 255L)
        val g = math.min((6L * 3 + sx + sy) % 256 + delta, 255L)
        val b = math.min((6L * 7 + sx * 4 + sy * 2) % 256 + delta, 255L)
        ((299 * r + 587 * g + 114 * b) / 1000).toInt
      }
      val mean = gray.sum / 64
      var hi = 0L; var lo = 0L
      gray.zipWithIndex.foreach { case (g, k) =>
        if (g > mean) { if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k }
      }
      (hi, lo)
    }
    assert((out(0).getLong(3), out(0).getLong(4)) == gridHash(0))
    assert(out(0).getInt(1) == w && out(0).getInt(2) == h)
    // identical bytes -> identical hash
    assert(out(1).toSeq.drop(1) == out(0).toSeq.drop(1))
    // the shifted variant matches ITS closed-form hash (and, with no
    // clamping on these small channel values, equals the base hash —
    // the brightness-invariance property)
    assert((out(2).getLong(3), out(2).getLong(4)) == gridHash(8))
    // malformed + null payloads quarantine to all-null features
    Seq(3, 4).foreach { i =>
      assert((1 to 4).forall(out(i).isNullAt), s"row $i not quarantined")
    }
  }

  test("winnowing: a shared >= gram+window-1 substring guarantees a " +
      "shared fingerprint; disjoint docs never pair") {
    // docs 1 and 2 share an 18-char passage at different offsets;
    // docs 3 and 4 are disjoint from everything
    val shared = "zqxjkwvbnmpfghrldc"
    val df = docFrame(
      1L -> s"aaaa bbbb $shared cccc dddd",
      2L -> s"eeee $shared ffff gggg hhhh iiii",
      3L -> "1111 2222 3333 4444 5555 6666 7777",
      4L -> "8888 9999 0000 !!!! @@@@ #### $$$$")
    val got = Dedup.winnowingPairs(df, "doc_id", "text",
        gram = 8, window = 4, maxFpDf = 32, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the winnowing guarantee: length >= 8+4-1 = 11 shared substring
    // MUST surface at least one common selected fingerprint
    assert(got.contains((1L, 2L)), s"guaranteed pair missing: $got")
    // disjoint docs never pair
    Seq(3L, 4L).foreach { d =>
      assert(!got.exists(p => p._1 == d || p._2 == d), s"false pair on $d")
    }
    // determinism under repartitioning
    val again = Dedup.winnowingPairs(df.repartition(3), "doc_id", "text",
        gram = 8, window = 4, maxFpDf = 32, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == got)
  }

  test("winnow_fps native expression is bit-identical to the portable " +
      "declarative spelling (incl. multi-byte chars and short docs)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps going",
      "répétition déjà-vu — üñïçødé text with ééé multi-byte runs here",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // constant text: one distinct fp
      "short", // < gram chars → empty
      "exactly11ch", // nGrams=4=window → one full window
      "",
      null) // null text: BOTH paths must return null, not empty
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val gram = 8; val window = 4
    val norm = TextOps.normText(col("text"))
    val hs = transform(TextOps.charNgrams(norm, gram),
      g => graft.ops.Sampling.md5Prefix32(g))
    // the winnowingPairs fallback spelling, INCLUDING its explicit null
    // propagation (size(null) = -1 would otherwise route null text to
    // the empty-array branch while the native expression returns null)
    val portable = when(norm.isNull, lit(null).cast("array<long>"))
      .otherwise(array_distinct(when(size(hs) >= window,
        transform(sequence(lit(1), size(hs) - window + 1),
          i => array_min(slice(hs, i, lit(window)))))
        .otherwise(array().cast("array<long>"))))
    val rows = df.select(col("doc_id"),
        call_function("winnow_fps", norm, lit(gram), lit(window))
          .as("native"),
        portable.as("decl"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Long](1)} != " +
          s"declarative ${r.getSeq[Long](2)}")
    }
    // short doc and empty doc produce empty (not null) fingerprint sets
    assert(rows(3).getSeq[Long](1).isEmpty && rows(5).getSeq[Long](1).isEmpty)
    // constant text has exactly one distinct fingerprint
    assert(rows(2).getSeq[Long](1).length == 1)
    // null text is null through BOTH paths (the contract ADVICE r9
    // flagged: it must not depend on GraftExtensions being installed)
    assert(rows(6).isNullAt(1) && rows(6).isNullAt(2))
  }

  test("tri_hashes native expression is bit-identical to the declarative " +
      "array_distinct(transform(charNgrams, xxhash64)) spelling") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "répétition déjà-vu üñïçødé multi-byte ééé runs", // non-ASCII spans
      "aaaaaaaa", // constant text: one distinct trigram
      "ab", // < gram chars → empty
      "abc", // exactly one gram
      "",
      null) // null text: BOTH paths yield EMPTY (charNgrams' when routes
            // a null length to the array() branch — the opposite of
            // winnow_fps' null contract, deliberately, because triFrame's
            // declarative spelling has always produced empty here)
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Seq(3, 5).foreach { gram =>
      val rows = df
        .select(col("doc_id"), TextOps.normText(col("text")).as("t"))
        .select(col("doc_id"),
          call_function("tri_hashes", col("t"), lit(gram)).as("native"),
          array_distinct(transform(TextOps.charNgrams(col("t"), gram),
            g => xxhash64(g))).as("decl"))
        .orderBy("doc_id").collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"gram=$gram doc ${r.getLong(0)}: native ${r.getSeq[Long](1)} " +
            s"!= declarative ${r.getSeq[Long](2)}")
      }
      // null and short text produce EMPTY (not null) through both paths
      assert(rows(6).getSeq[Long](1).isEmpty && rows(6).getSeq[Long](2).isEmpty)
      assert(rows(3).getSeq[Long](1).isEmpty)
    }
    // hash values equal Spark's own xxhash64 of the substring grams
    val one = df.where(col("doc_id") === 4L)
      .select(call_function("tri_hashes",
        TextOps.normText(col("text")), lit(3)).as("h"),
        xxhash64(TextOps.normText(col("text"))).as("whole"))
      .head()
    assert(one.getSeq[Long](0) == Seq(one.getLong(1))) // "abc": gram==doc
    // determinism + first-occurrence order: repeated grams keep position
    val rep = df.sparkSession.sql(
      "SELECT tri_hashes('abcabc', 3) AS h").head().getSeq[Long](0)
    assert(rep.length == 3) // abc, bca, cab; the second abc dup-drops
  }

  test("min_shingle_fp native expression is bit-identical to the " +
      "declarative array_min(transform(charNgrams, md5_prefix32)) " +
      "spelling, incl. random Unicode") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deterministic random-Unicode corpus spanning 1-4-byte UTF-8 runs
    // (ASCII, Latin-1 sup, CJK, emoji) plus the edge shapes
    val rnd = new scala.util.Random(408)
    val pools = Seq(
      ('a' to 'z').mkString + " ",
      "àéîõüñçß¡¿",
      "漢字かなカナ한글",
      "😀🚀🍕") // surrogate-pair emoji
    val randomTexts = (0 until 40).map { _ =>
      val n = 1 + rnd.nextInt(60)
      (0 until n).map { _ =>
        val p = pools(rnd.nextInt(pools.length))
        // nextInt over code-unit positions can split a surrogate pair;
        // pick by code POINT so every text is well-formed UTF-16
        val cps = p.codePoints().toArray
        new String(Character.toChars(cps(rnd.nextInt(cps.length))))
      }.mkString
    }
    val texts: Seq[String] = randomTexts ++ Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaa", // constant text: all shingles hash equal
      "short", // < gram chars → null
      "exactly8", // exactly one shingle
      "",
      null)
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Seq(3, 8).foreach { gram =>
      val rows = df.select(col("doc_id"),
          call_function("min_shingle_fp",
            TextOps.normText(col("text")), lit(gram)).as("native"),
          TextOps.minShingleFingerprintDeclarative(col("text"), gram)
            .as("decl"))
        .orderBy("doc_id").collect()
      rows.foreach { r =>
        val n = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
        val d = if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))
        assert(n == d,
          s"gram=$gram doc ${r.getLong(0)}: native $n != declarative $d")
      }
      // short / empty / null text → null through BOTH paths
      val tail = rows.takeRight(4)
      if (gram == 8) assert(tail(0).isNullAt(1) && tail(0).isNullAt(2)) // "short"
      assert(tail(2).isNullAt(1) && tail(2).isNullAt(2)) // ""
      assert(tail(3).isNullAt(1) && tail(3).isNullAt(2)) // null
    }
    // the TextOps entry point routes to the native kernel under
    // GraftExtensions and keeps the same value
    val viaOps = df.select(col("doc_id"),
        TextOps.minShingleFingerprint(col("text"), 8).as("fp"),
        TextOps.minShingleFingerprintDeclarative(col("text"), 8).as("ref"))
      .collect()
    viaOps.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2) &&
        (r.isNullAt(1) || r.getLong(1) == r.getLong(2)))
    }
  }

  test("envelope hash: byte-identical clips collide, JVM reference " +
      "matches, quarantine holds") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val rows = Seq(
      (1L, Multimodal.synthWavBytesScaled(12L, 1, 1)),
      (2L, Multimodal.synthWavBytesScaled(12L, 1, 1)), // identical copy
      (3L, Multimodal.synthWavBytesScaled(12L, 9, 8)), // gain x9/8
      (4L, "RIFFjunk".getBytes("US-ASCII")),
      (5L, null.asInstanceOf[Array[Byte]]))
    val schema = StructType(Seq(StructField("media_id", LongType, false),
      StructField("payload", BinaryType, true)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (i, p) => Row(i, p) }).asJava), schema)
    val out = Multimodal.envelopeHashWav(df)
      .select("media_id", "sample_rate", "n_samples", "env_hash")
      .orderBy("media_id").collect()
    // independent reference over the closed-form samples
    def refHash(num: Int, den: Int): Long = {
      val n = (64 + 12 % 32).toInt
      val samples = (0 until n).map { i =>
        val base = ((12L * 31 + i * 7) % 2048) - 1024
        math.max(-32768L, math.min(32767L, base * num / den))
      }
      val segSum = new Array[Long](32); val segCnt = new Array[Long](32)
      samples.zipWithIndex.foreach { case (s, i) =>
        val k = (i.toLong * 32 / n).toInt
        segSum(k) += math.abs(s); segCnt(k) += 1
      }
      val means = (0 until 32).map(k => segSum(k) / segCnt(k))
      val mean = means.sum / 32
      means.zipWithIndex.foldLeft(0L) { case (h, (m, k)) =>
        if (m > mean) h | (1L << k) else h
      }
    }
    assert(out(0).getInt(1) == 8000 && out(0).getLong(2) == 76L)
    assert(out(0).getLong(3) == refHash(1, 1))
    assert(out(1).toSeq == out(0).toSeq.updated(0, 2L))
    assert(out(2).getLong(3) == refHash(9, 8))
    Seq(3, 4).foreach { i =>
      assert((1 to 3).forall(out(i).isNullAt), s"row $i not quarantined")
    }
  }

  test("bloom pre-screened incremental dedup equals the plain anti-join") {
    val rnd = new scala.util.Random(777)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def randDoc() = Seq.fill(4 + rnd.nextInt(8))(
      vocab(rnd.nextInt(vocab.length))).mkString(" ")
    (1 to 3).foreach { _ =>
      val refRows = (1L to 25L).map(i => (i, randDoc()))
      val ref = docFrame(refRows: _*)
      // fresh batch: some verbatim/whitespace-variant copies of standing
      // docs (must drop), some new docs (must keep)
      val freshRows = (101L to 130L).map { i =>
        if (rnd.nextBoolean()) {
          val t = refRows(rnd.nextInt(refRows.length))._2
          (i, if (rnd.nextBoolean()) t.replace(" ", "  ") else t)
        } else (i, randDoc())
      }
      val fresh = docFrame(freshRows: _*)
      val plain = Dedup.exactAgainst(fresh, ref, "doc_id", "text",
        byFingerprint = true)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bloom = Dedup.exactAgainstBloom(fresh, ref, "doc_id", "text",
        byFingerprint = true)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloom == plain)
      // a deliberately saturated filter (huge fpp -> everything a maybe)
      // still agrees: the maybes path alone IS the exact anti-join
      val saturated = Dedup.exactAgainstBloom(fresh, ref, "doc_id", "text",
        byFingerprint = true, fpp = 0.99)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(saturated == plain)
    }
    // empty reference keeps everything (and must not build a 0-item bloom)
    val fresh = docFrame((1L, "a doc"), (2L, "b doc"))
    assert(Dedup.exactAgainstBloom(fresh, fresh.limit(0), "doc_id", "text")
      .count() == 2L)
    // plan contract: the anti-join's streamed input is the
    // might_contain-filtered MAYBE subset, not the whole batch — the
    // definite-miss branch bypasses the join entirely. Parquet-backed
    // inputs: local relations would let the optimizer fold the whole
    // plan away and there would be nothing to assert on.
    val refP = tmpDir("bloom_ref").toString
    val freshP = tmpDir("bloom_fresh").toString
    docFrame((51L, "standing one"), (52L, "standing two"))
      .write.mode("overwrite").parquet(refP)
    docFrame((1L, "a doc"), (2L, "standing one"))
      .write.mode("overwrite").parquet(freshP)
    val out = Dedup.exactAgainstBloom(spark.read.parquet(freshP),
      spark.read.parquet(refP), "doc_id", "text")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L))
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val antis = out.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftAnti => j }
    assert(antis.nonEmpty, "bloom path lost its anti-join")
    assert(antis.forall(_.left.collectFirst {
      case f: Filter if f.condition.exists(
        _.isInstanceOf[BloomFilterMightContain]) => f
    }.nonEmpty), "anti-join input is not the might_contain-filtered subset")
  }

  test("nearDupAgainstIndex equals nearDupAgainst; plan scans the index") {
    val refDocs = docFrame(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "shared duplicated content exactly the same thing"),
      (3L, "completely unrelated reference text about databases and streams"))
    val newDocs = docFrame(
      (10L, "the quick brown fox jumps over the lazy dog now"),
      (11L, "novel content alpha beta gamma delta epsilon zeta"),
      (12L, "shared duplicated content exactly the same thing"))
    val idxDir = tmpDir("lsh_idx").toString
    Dedup.lshIndexRows(refDocs, "doc_id", "text", numHashes = 32, bands = 8)
      .select("doc_id", "band", "bucket")
      .write.mode("overwrite").parquet(idxDir)
    val viaIndex = Dedup.nearDupAgainstIndex(newDocs,
      spark.read.parquet(idxDir), refDocs, "doc_id", "text",
      minJaccard = 0.5)
    val got = viaIndex.select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = Dedup.nearDupAgainst(newDocs, refDocs, "doc_id", "text",
      minJaccard = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == plain && got == Set(11L))
    // the returned plan keeps its lineage and reads the PERSISTED index
    // (the nightly-cadence contract) — no checkpoint hides the scan.
    // The plan's toString elides file paths, so inspect the relations.
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scanned = viaIndex.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
        case _ => ""
      }
    }
    assert(scanned.exists(_.contains("lsh_idx")),
      s"plan does not scan the persisted index (scans: $scanned)")
    // random corpora: operator equality against the self-contained path
    val rnd = new scala.util.Random(4711)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def randDoc() = Seq.fill(5 + rnd.nextInt(10))(
      vocab(rnd.nextInt(vocab.length))).mkString(" ")
    (1 to 2).foreach { _ =>
      val refRows = (1L to 15L).map(i => (i, randDoc()))
      val newRows = (101L to 115L).map { i =>
        if (rnd.nextInt(3) == 0) (i, refRows(rnd.nextInt(refRows.length))._2)
        else (i, randDoc())
      }
      val refF = docFrame(refRows: _*); val newF = docFrame(newRows: _*)
      val d2 = tmpDir("lsh_idx2").toString
      Dedup.lshIndexRows(refF, "doc_id", "text", numHashes = 32, bands = 8)
        .select("doc_id", "band", "bucket")
        .write.mode("overwrite").parquet(d2)
      val a = Dedup.nearDupAgainstIndex(newF, spark.read.parquet(d2), refF,
        "doc_id", "text", minJaccard = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val b = Dedup.nearDupAgainst(newF, refF, "doc_id", "text",
        minJaccard = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a == b)
      // staged batch-index rows (the q89 one-signature-pass path) give
      // the identical kept set
      val bp = tmpDir("lsh_bat").toString
      Dedup.lshIndexRows(newF, "doc_id", "text", numHashes = 32, bands = 8)
        .select("doc_id", "band", "bucket")
        .write.mode("overwrite").parquet(bp)
      val c = Dedup.nearDupAgainstIndex(newF, spark.read.parquet(d2), refF,
        "doc_id", "text", minJaccard = 0.5,
        batchIndex = Some(spark.read.parquet(bp)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(c == b)
    }
  }

  test("prefixJaccardPairs == brute force on distinct word sets, " +
      "inclusive at exactly J = 0.5") {
    val df = docFrame(
      1L -> "a b c d",        // {a,b,c,d}
      2L -> "a b c e",        // J(1,2) = 3/5 = 0.6
      3L -> "a b e f",        // J(1,3) = 2/6 = 1/3; J(2,3) = 3/5
      4L -> "a b c d e f g h",// J(1,4) = 4/8 = 0.5 exactly (inclusive)
      5L -> "x y z")          // disjoint
    val sets = Map(1L -> Set("a","b","c","d"), 2L -> Set("a","b","c","e"),
      3L -> Set("a","b","e","f"), 4L -> Set("a","b","c","d","e","f","g","h"),
      5L -> Set("x","y","z"))
    val brute = (for {
      i <- sets.keys; j <- sets.keys if i < j
      inter = (sets(i) & sets(j)).size
      jac = inter.toDouble / (sets(i) | sets(j)).size
      if jac >= 0.5
    } yield (i, j, inter, jac)).toSet
    val got = Dedup.prefixJaccardPairs(df, "doc_id", "text", 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
      .toSet
    assert(got == brute, s"got $got\nbrute $brute")
    assert(got.exists(_._4 == 0.5), "inclusive boundary pair missing")
  }

  test("wordSetDedup: permutations and repetitions collide, different " +
      "vocabularies don't; canonical is the min id") {
    val df = docFrame(
      1L -> "alpha beta gamma delta",
      2L -> "delta gamma beta alpha",        // permutation → same fp
      3L -> "alpha alpha beta beta gamma delta gamma", // repetition → same
      4L -> "alpha beta gamma epsilon")      // different vocab
    val got = Dedup.wordSetDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((3L, 1L)) && got(2L) == ((3L, 1L)) &&
      got(3L) == ((3L, 1L)), s"got $got")
    assert(got(4L) == ((1L, 4L)))
  }

  test("hammingPairs64 over raw hash frames: planted hamming-2 pair " +
      "found, across-threshold pair rejected, straddling chunks ok") {
    import spark.implicits._
    // a/b differ in 2 bits in DIFFERENT chunks (bit 0 of lo, bit 0 of
    // hi) — pigeonhole still catches them via the two untouched chunks;
    // c differs from a by 4 bits > maxHamming=3 → rejected
    val a = (1L, 0x00000000F0F0F0F0L & 0xFFFFFFFFL, 0x12345678L)
    val b = (2L, a._2 ^ 1L, a._3 ^ 1L)
    val c = (3L, a._2 ^ 0xFL, a._3)
    val df = Seq(a, b, c).toDF("id", "lo", "hi")
    val got = Dedup.hammingPairs64(df, "id", "lo", "hi", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 2)), s"got $got")
  }

  test("hammingPairs64 equals brute-force on random clustered hashes " +
      "(pigeonhole exactness property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    (1 to 3).foreach { _ =>
      // clustered values: a few seeds, most hashes are a seed with a
      // couple of bits flipped — dense in the <=3-hamming regime
      val seeds = Array.fill(4)(
        (rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL))
      val rows = (1L to 30L).map { id =>
        val (lo0, hi0) = seeds(rnd.nextInt(seeds.length))
        val flips = rnd.nextInt(5)
        var lo = lo0; var hi = hi0
        (0 until flips).foreach { _ =>
          val b = rnd.nextInt(64)
          if (b < 32) lo ^= (1L << b) else hi ^= (1L << (b - 32))
        }
        (id, lo, hi)
      }
      val brute = (for {
        a <- rows; b <- rows if a._1 < b._1
        h = java.lang.Long.bitCount(a._2 ^ b._2) +
          java.lang.Long.bitCount(a._3 ^ b._3)
        if h <= 3
      } yield (a._1, b._1, h)).toSet
      val blocked = Dedup.hammingPairs64(rows.toDF("id", "lo", "hi"),
          "id", "lo", "hi", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(blocked == brute, s"blocked=$blocked brute=$brute")
    }
  }

  test("rrfFuse: both-arm candidates outrank single-arm; absent arm " +
      "contributes 0; score scale of the arms is irrelevant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // query 1: candidate 10 ranks 3rd lexically and 3rd densely;
    // candidate 11 is rank-1 lexically only; 12 rank-1 densely only.
    // RRF: 10 → 2/63 ≈ 0.0317 beats 11/12 → 1/61 ≈ 0.0164.
    val armA = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 10L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val armB = Seq((1L, 12L, 1), (1L, 14L, 2), (1L, 10L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.rrfFuse(armA, armB, topK = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.head._1 == 10L, s"both-arm candidate not first: ${got.toSeq}")
    assert(math.abs(got.head._2 - 2.0 / 63.0) < 1e-15)
    // single-arm candidates all score exactly their one reciprocal
    assert(got.tail.forall { case (_, s, _) =>
      Seq(1.0 / 61.0, 1.0 / 62.0).exists(v => math.abs(s - v) < 1e-15)
    })
    // ties (11 vs 12, both 1/61) break by neighbor_id
    val tied = got.filter(g => math.abs(g._2 - 1.0 / 61.0) < 1e-15)
    assert(tied.map(_._1).toSeq == tied.map(_._1).toSeq.sorted)
  }

  test("editDistanceOnePairs equals brute-force same-length lev<=1 on " +
      "random small-alphabet strings (wildcard exactness property)") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(20260814)
    (1 to 3).foreach { _ =>
      // small alphabet + mixed lengths: dense in the lev<=1 regime,
      // with cross-length near-misses the contract must exclude and
      // exact duplicates (diff_pos 0)
      val rows = (1L to 40L).map { id =>
        val len = 3 + rnd.nextInt(2)
        (id, Array.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString)
      }
      val brute = (for {
        a <- rows; b <- rows if a._1 < b._1
        if a._2.length == b._2.length && lev(a._2, b._2) <= 1
      } yield (a._1, b._1, lev(a._2, b._2).toLong)).toSet
      val blocked = Dedup.editDistanceOnePairs(
          rows.toDF("id", "s"), "id", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
        .toSet
      assert(blocked == brute, s"blocked=$blocked brute=$brute")
    }
    // diff_pos: 1-based differing position; 0 for identical strings
    val out = Dedup.editDistanceOnePairs(
        Seq((1L, "abc"), (2L, "abc"), (3L, "axc"), (4L, "abcd"))
          .toDF("id", "s"), "id", "s")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map((1L, 2L) -> (0L, 0L), (1L, 3L) -> (1L, 2L),
      (2L, 3L) -> (1L, 2L)), s"got $out") // 4 (len 4) pairs with nobody
    // empty strings stay out of scope: sequence(1, 0) is DESCENDING in
    // Spark, so an unguarded empty string would emit the bare wildcard
    // and pair with every 1-char string across the length contract
    val empt = Dedup.editDistanceOnePairs(
        Seq((1L, ""), (2L, ""), (3L, "a"), (4L, "b")).toDF("id", "s"),
        "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(empt == Set((3L, 4L)), s"got $empt")
  }

  test("mipsTopK: empty corpus returns an empty frame with the output " +
      "schema (module empty-input convention, not an NPE)") {
    import spark.implicits._
    val qs = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = qs.where(lit(false))
    val out = Similarity.mipsTopK(qs, corpus, "vec_id", "embedding", k = 3)
    assert(out.columns.toSeq ==
      Seq("query_id", "neighbor_id", "dot", "rank"))
    assert(out.count() == 0L)
    // id field types derive from the INPUT schemas (r11 advice): a
    // string-keyed corpus must not come back long-typed — that frame
    // would fail a later union with the non-empty path's output
    val qsStr = Seq(("a", Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val outStr = Similarity.mipsTopK(qsStr, qsStr.where(lit(false)),
      "vec_id", "embedding", k = 3)
    assert(outStr.schema("query_id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(outStr.schema("neighbor_id").dataType ==
      org.apache.spark.sql.types.StringType)
    // and it unions cleanly with a non-empty run over the same key type
    val nonEmpty = Similarity.mipsTopK(qsStr,
      Seq(("b", Seq(1.0f, 0.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 3)
    assert(outStr.unionByName(nonEmpty).count() == nonEmpty.count())
  }

  test("phraseOccurrences: overlapping starts count; multi-term join; " +
      "absent phrase yields no row") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a b"),     // "a a" starts at 0 and 1 -> 2 occurrences
      (2L, "a b a b a"),   // "a b a" at 0 and 2 -> 2
      (3L, "b b b"),
      (4L, "a")).toDF("doc_id", "text")
    val two = TextOps.phraseOccurrences(d, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(two == Map(1L -> 2L), s"got $two")
    val three = TextOps.phraseOccurrences(d, "doc_id", "text",
        Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(three == Map(2L -> 2L), s"got $three")
    val single = TextOps.phraseOccurrences(d, "doc_id", "text", Seq("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(single == Map(1L -> 3L, 2L -> 3L, 4L -> 1L), s"got $single")
  }

  test("decileLift guard: a boundary-spanning tie group larger than the " +
      "threshold fails loudly; healthy distributions are unaffected") {
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    // 20 docs, all distinct scores -> every group has cnt = 1; even a
    // guard of 1 never fires and deciles are exact 2-doc buckets
    val healthy = (1 to 20).map(i =>
        (i.toLong, BigDecimal(i) / 100, if (i % 2 == 0) 1L else 0L))
      .toDF("doc_id", "q", "pos")
      .select(col("doc_id"),
        col("q").cast(DecimalType(18, 12)).as("q"), col("pos"))
    val out = QueriesExt.decileLift(healthy, spanRankGuard = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 10 && out.forall(_._2 == 2L), out.toSeq.toString)
    // mass-point distribution: 14 of 20 docs share one score, so the
    // tie group spans several decile boundaries. With the default
    // guard (1M) the doc-level ranking handles it exactly...
    val degen = (1 to 20).map(i =>
        (i.toLong, if (i <= 14) BigDecimal("0.5") else BigDecimal(i) / 100,
          if (i % 2 == 0) 1L else 0L))
      .toDF("doc_id", "q", "pos")
      .select(col("doc_id"),
        col("q").cast(DecimalType(18, 12)).as("q"), col("pos"))
    val ok = QueriesExt.decileLift(degen).collect()
    assert(ok.map(_.getLong(1)).sum == 20L)
    // ...but a guard below the group size fails LOUDLY (named message),
    // instead of silently feeding one corpus-scale group to one sort task
    val e = intercept[Exception] {
      QueriesExt.decileLift(degen, spanRankGuard = 5L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("degenerate for rank-bucketing")),
      messages(e).mkString(" | "))
  }

  test("bandsFor: reproduces the measured q22 re-banding (SCALING.md " +
      "§6b) and holds the false-candidate mass linear") {
    // test-scale corpus (sf0.1, ~60k docs): the registered q22 form, 8x4
    val small = Dedup.bandsFor(60000L, targetJaccard = 0.5)
    assert((small.bands, small.rowsPerBand) == ((8, 4)), small.toString)
    // 100x corpus (500k docs): the measured re-banding, 4x8; the model's
    // false-candidate count must pin the MEASURED 20 within 2x (19.5)
    val big = Dedup.bandsFor(500000L, targetJaccard = 0.5)
    assert((big.bands, big.rowsPerBand) == ((4, 8)), big.toString)
    assert(big.expectedFalseCandidates > 10 &&
      big.expectedFalseCandidates < 40, big.toString)
    // knee is the documented S-curve threshold (1/b)^(1/r)
    assert(math.abs(big.knee - math.pow(4.0, -1.0 / 8)) < 1e-12)
    // linearity: with r adapting ~log n, false candidates stay o(n)
    // where the FIXED 8x4 banding measured ~2.86M at 500k (quadratic)
    Seq(1000000L, 100000000L, 1000000000L).foreach { n =>
      val p = Dedup.bandsFor(n, 0.5)
      assert(p.expectedFalseCandidates < n.toDouble,
        s"n=$n plan=$p")
    }
    // rowsPerBand always divides numHashes (minHashLshPairs contract)
    (1 to 12).foreach { e =>
      val p = Dedup.bandsFor(1L << (2 * e), 0.5, numHashes = 32)
      assert(32 % p.bands == 0 && p.bands * p.rowsPerBand == 32)
    }
    // degenerate args are refused loudly
    intercept[IllegalArgumentException](Dedup.bandsFor(0L, 0.5))
    intercept[IllegalArgumentException](Dedup.bandsFor(10L, 1.5))
    intercept[IllegalArgumentException](
      Dedup.bandsFor(10L, 0.5, backgroundJaccard = 0.6))
    // and the plan drops straight into minHashLshPairs: a planted
    // near-twin pair is found under the plan's banding
    val df = docFrame(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "completely different text about spark catalyst planning"))
    val plan = Dedup.bandsFor(3L, 0.5)
    val pairs = Dedup.minHashLshPairs(df, "doc_id", "text",
        numHashes = 32, bands = plan.bands)
      .where(col("jaccard") >= 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)), pairs.mkString(","))
  }

  test("retireFromIndex removes exactly the listed docs' rows and " +
      "composes with re-add into an update") {
    import spark.implicits._
    val docs = docFrame(
      (1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu"))
    val idx = Dedup.lshIndexRows(docs, "doc_id", "text",
      numHashes = 16, bands = 4).select("doc_id", "band", "bucket")
    val retired = Dedup.retireFromIndex(idx, Seq(2L).toDF("doc_id"),
      "doc_id")
    // layout preserved, doc 2's rows gone, others untouched
    assert(retired.columns.toSeq == Seq("doc_id", "band", "bucket"))
    assert(retired.where(col("doc_id") === 2L).count() == 0)
    assert(retired.count() == idx.where(col("doc_id") =!= 2L).count())
    // UPDATE = retire(old) then append(new-text rows): equals the
    // from-scratch index of the post-update corpus
    val updatedDoc = docFrame((2L, "epsilon zeta eta theta revised"))
    val after = retired.unionByName(
      Dedup.lshIndexRows(updatedDoc, "doc_id", "text",
        numHashes = 16, bands = 4).select("doc_id", "band", "bucket"))
    val scratch = Dedup.lshIndexRows(
      docs.where(col("doc_id") =!= 2L).unionByName(updatedDoc),
      "doc_id", "text", numHashes = 16, bands = 4)
      .select("doc_id", "band", "bucket")
    assert(after.exceptAll(scratch).count() == 0 &&
      scratch.exceptAll(after).count() == 0)
    // extra columns on the retire list are ignored
    val retired2 = Dedup.retireFromIndex(idx,
      Seq((2L, "x")).toDF("doc_id", "junk"), "doc_id")
    assert(retired2.count() == retired.count())
  }
}
