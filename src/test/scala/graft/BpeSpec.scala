package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bpe, TextOps}

/** BPE training + distributed application, pinned two independent ways:
  * exact token ids against a reference implementation that applies merges
  * in rank order (a different control flow than the operator's
  * greedy-lowest-rank loop — the two are equivalent by the standard BPE
  * argument, so agreement is a real check), and the pre-token boundary
  * tied to [[TextOps.bpeTokenCount]].
  */
class BpeSpec extends SparkSpec {

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "don't let the dog eat the cat food",
    "numbers 123 and 4567 mix with words",
    "punctuation!! stays, separate... ok?")

  /** Reference apply: for each merge RULE IN ORDER, merge every
    * occurrence in the word — sequential-rule application, equivalent to
    * the operator's greedy-by-rank search.
    */
  private def refEncode(text: String, v: Bpe.Vocab): Array[Int] =
    Bpe.pretokens(text).toArray.flatMap { w =>
      var sym = w.map(_.toString).toVector
      v.merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i < sym.length - 1 && sym(i) == a && sym(i + 1) == b) {
            out += a + b; i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.result()
      }
      sym.map(s => v.ids.getOrElse(s, -1))
    }

  private def docFrame(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("encoded ids match the rank-order reference implementation") {
    val v = Bpe.train(corpus, numMerges = 50)
    assert(v.merges.nonEmpty && v.size > v.merges.length)
    val df = docFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val got = Bpe.encode(df, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong).sameElements(refEncode(t, v)),
        s"doc $i: ${got(i.toLong).toSeq} vs ${refEncode(t, v).toSeq}")
    }
    // merges actually fire: common words compress below character count
    val charCount = Bpe.pretokens(corpus.head).map(_.length).sum
    assert(got(0L).length < charCount)
  }

  test("pre-token boundary matches bpeTokenCount on edge cases") {
    val cases = Seq(
      "don't it's we'll we've we're i'd i'm",
      " leading space", "trailing space ", "  double  spaces  ",
      "word123mix", "123 456", "a!b?c...d", "!!!", "",
      "héllo ñandú çédille", "tab\tand\nnewline",
      "'s 'll 've 're bare contractions", "mixed-hyphen-word")
    val df = docFrame(cases.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val viaSpark = df.select(col("doc_id"),
      TextOps.bpeTokenCount(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(Bpe.pretokens(t).length == viaSpark(i.toLong),
        s"case '$t': ${Bpe.pretokens(t)} vs ${viaSpark(i.toLong)}")
    }
  }

  test("zero merges splits to characters; unseen chars encode as -1") {
    val v = Bpe.train(corpus, numMerges = 0)
    assert(v.merges.isEmpty)
    val df = docFrame(Seq((1L, "the cat"), (2L, "zebra~")))
    val got = Bpe.encode(df, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L).length == "the cat".length) // every char one token
    assert(got(1L).forall(_ >= 0))
    assert(got(2L).contains(-1)) // '~' never seen in training
  }

  test("encoding is deterministic across partitionings") {
    val v = Bpe.train(corpus, numMerges = 30)
    val rows = (0 until 64).map(i => (i.toLong, corpus(i % corpus.length)))
    def run(parts: Int) =
      Bpe.encode(docFrame(rows).repartition(parts), "doc_id", "text", v)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val a = run(1); val b = run(7)
    assert(a.keySet == b.keySet && a.forall { case (k, ids) => ids == b(k) })
  }

  test("random corpora: operator and rank-order reference always agree") {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abcde '.,!?0123456789  "
    def randText() = (0 until (5 + rnd.nextInt(60)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 4).foreach { _ =>
      val texts = Seq.fill(12)(randText())
      val v = Bpe.train(texts.take(6), numMerges = 25)
      val df = docFrame(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      val got = Bpe.encode(df, "doc_id", "text", v)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong).sameElements(refEncode(t, v)),
          s"text '$t' merges=${v.merges}")
      }
    }
  }

  test("distributed training learns the same vocab as driver training") {
    val df = docFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val want = Bpe.train(corpus, numMerges = 30)
    val got = Bpe.trainDistributed(df.repartition(5), "text", 30)
    assert(got.merges == want.merges)
    assert(got.ids == want.ids)
    // exhaustion: asking for more merges than exist stops identically
    val rnd = new scala.util.Random(77)
    val texts = Seq.fill(8)((0 until (3 + rnd.nextInt(20)))
      .map(_ => "abc ab"(rnd.nextInt(6))).mkString)
    val w2 = Bpe.train(texts, numMerges = 500)
    val g2 = Bpe.trainDistributed(
      docFrame(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }),
      "text", 500)
    assert(g2.merges == w2.merges && g2.ids == w2.ids)
  }

  test("non-BMP corpora: driver and distributed training still agree") {
    // supplementary-plane characters (emoji) exercise the two historical
    // divergence points: per-Char splitting would cut them into lone
    // surrogates (mangled through UTF8String), and the driver tie-break
    // must use UTF-8 byte order, not UTF-16 code-unit order — U+FF5E
    // sorts ABOVE an emoji in UTF-16 but BELOW it in UTF-8
    val texts = Seq(
      "😀😀 a😀 ab ab",
      "～～ a～ 😀😀",
      "ab a😀 ～～ 😀😀")
    val want = Bpe.train(texts, numMerges = 12)
    // every learned symbol is a valid code-point sequence — no lone
    // surrogates anywhere in the vocab
    want.ids.keysIterator.foreach { s =>
      // a lone surrogate anywhere (not just trailing) breaks the UTF-8
      // round-trip: the encoder substitutes '?' and equality fails
      val rt = new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(rt == s, s"lone surrogate in symbol $s")
    }
    val df = docFrame(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val got = Bpe.trainDistributed(df.repartition(3), "text", 12)
    assert(got.merges == want.merges)
    assert(got.ids == want.ids)
    // and the encoder round-trips emoji text through the learned vocab
    val ids = Bpe.encodePretoken("a😀", want)
    assert(ids.nonEmpty && ids.forall(_ >= 0))
  }

  test("n_pretokens column matches driver pretokenization") {
    val v = Bpe.train(corpus, numMerges = 10)
    val df = docFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val got = Bpe.encode(df, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == Bpe.pretokens(t).length)
    }
  }
}
