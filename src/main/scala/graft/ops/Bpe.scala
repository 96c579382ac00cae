package graft.ops

import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding application over the GPT-2-style pre-token
  * split ([[TextOps.BpePattern]]): a learned merges table applied to every
  * document, producing actual token ids — the statistic a training
  * pipeline needs for length/packing decisions, where
  * [[TextOps.bpeTokenCount]] only counts pre-tokens.
  *
  * Split of labor, as in production tokenizer pipelines:
  *  - [[train]] is the OFFLINE step: learn merges from a (driver-side)
  *    corpus sample. Tokenizer training is inherently sequential over
  *    merge rounds and is never re-run per-query at scale — the sample
  *    collect is the same boundary as IVF's driver-sized centroids.
  *  - [[encode]] is the DISTRIBUTED step: the merges table rides a
  *    broadcast variable, each partition applies it with a per-partition
  *    memo cache (pre-tokens repeat heavily, so most lookups are hits),
  *    and no shuffle happens at all — encoding is a pure per-row map,
  *    scan speed at any corpus size.
  */
object Bpe {

  /** A learned BPE vocabulary.
    *
    * @param merges ordered merge rules (earlier = higher priority)
    * @param ids    token string → id; base characters first (sorted),
    *               then one id per merge in merge order
    */
  final case class Vocab(merges: Vector[(String, String)], ids: Map[String, Int]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
    def size: Int = ids.size
  }

  private val pretokenRe: Pattern = Pattern.compile(TextOps.BpePattern)

  /** Pre-tokens of `text` under the GPT-2-style pattern — the exact same
    * matches [[TextOps.bpeTokenCount]] counts (both are Java regex).
    * Null-safe like [[TextOps.tokensJvm]]: null text has no pre-tokens
    * (Matcher would NPE) — this is the choke point every train/encode
    * path tokenizes through.
    */
  def pretokens(text: String): Vector[String] = {
    if (text == null) return Vector.empty
    val m = pretokenRe.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Base symbols of a pre-token: one string per Unicode CODE POINT, not
    * per UTF-16 char — per-Char splitting would cut a supplementary-plane
    * character (emoji, rare CJK) into two lone surrogates, which are not
    * valid UTF-8 and get mangled when the distributed trainer's symbols
    * round-trip through Spark's UTF8String.
    */
  private def codePoints(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** UTF-8 byte order (== code-point order) — the order Spark's binary
    * UTF8String comparison gives [[trainDistributed]]'s min(struct(...));
    * the driver trainer must tie-break in the SAME order or merges
    * diverge on non-BMP corpora (UTF-16 code-unit order sorts surrogate
    * pairs BELOW U+E000..U+FFFF chars; UTF-8 sorts them above). Agrees
    * with plain lexicographic order on ASCII.
    */
  private val utf8Order: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    var r = 0
    while (i < n && r == 0) { r = (a(i) & 0xFF) - (b(i) & 0xFF); i += 1 }
    if (r != 0) r else a.length - b.length
  }

  /** Learn `numMerges` BPE merges from `texts` (offline/driver step).
    * Deterministic: the most frequent adjacent symbol pair wins each
    * round, ties broken by UTF-8 byte order of the pair (the order the
    * distributed trainer's struct-min evaluates; plain lexicographic on
    * ASCII).
    */
  def train(texts: Seq[String], numMerges: Int): Vocab = {
    // word-frequency model over pre-tokens: BPE statistics are per
    // distinct pre-token, weighted by its frequency
    val wordFreq = mutable.HashMap.empty[Vector[String], Long]
    texts.foreach { t =>
      pretokens(t).foreach { w =>
        val sym = codePoints(w)
        wordFreq.update(sym, wordFreq.getOrElse(sym, 0L) + 1L)
      }
    }
    val baseChars = wordFreq.keysIterator.flatten.toSeq.distinct.sorted
    val merges = Vector.newBuilder[(String, String)]
    var words = wordFreq
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val pairFreq = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (sym, f) =>
        var i = 0
        while (i < sym.length - 1) {
          val p = (sym(i), sym(i + 1))
          pairFreq.update(p, pairFreq.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pairFreq.isEmpty) exhausted = true
      else {
        val best = pairFreq.toSeq.minBy { case ((a, b), f) => (-f, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))._1
        merges += best
        val next = mutable.HashMap.empty[Vector[String], Long]
        words.foreach { case (sym, f) =>
          val merged = mergePair(sym, best)
          next.update(merged, next.getOrElse(merged, 0L) + f)
        }
        words = next
        made += 1
      }
    }
    val ms = merges.result()
    val ids = (baseChars ++ ms.map { case (a, b) => a + b })
      .zipWithIndex.toMap
    Vocab(ms, ids)
  }

  /** Distributed BPE training: identical merges to [[train]] (same
    * most-frequent-pair / lexicographic-tie rule), but the word-frequency
    * model lives in the cluster instead of driver memory. [[train]]'s
    * `wordFreq` map is DISTINCT-PRETOKEN-sized — unbounded on a web
    * corpus — while here it is a Dataset, each round is one exact
    * aggregation (adjacent-pair counts, map-side partials) plus one
    * argmin-of-struct (total order: count desc, pair lexicographic — no
    * partitioning dependence), and the merge applies as a distributed
    * map. Per-round localCheckpoint keeps lineage O(1) like
    * [[Dedup.connectedComponents]]'s propagation loop.
    *
    * Merge rounds are inherently sequential (each depends on the counts
    * AFTER the previous merge) — numMerges driver round-trips is the
    * algorithm, not a bottleneck: each round moves only pair-count
    * aggregates, never the corpus.
    */
  def trainDistributed(df: DataFrame, textCol: String,
      numMerges: Int): Vocab = {
    val spark = df.sparkSession
    import spark.implicits._
    // distinct pre-token frequency model, computed once: one explode +
    // one exact groupBy (Zipf head dominates, so this is far smaller
    // than the corpus — but unlike train()'s HashMap it never has to fit
    // on the driver)
    var words: Dataset[(Seq[String], Long)] = df
      .select(col(textCol).cast("string").as[String])
      .flatMap(t => pretokens(if (t == null) "" else t))
      .groupByKey(identity).count()
      .map { case (w, f) => (codePoints(w): Seq[String], f) }
      .localCheckpoint(true)
    val baseChars = words.flatMap(_._1).distinct().collect().sorted.toSeq
    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      // adjacent-pair counts; winner = min of (-count, a, b), the same
      // total order train() minimizes, evaluated as ONE aggregation
      val best = words.flatMap { case (sym, f) =>
        if (sym.length < 2) Iterator.empty
        else sym.iterator.zip(sym.iterator.drop(1)).map { case (a, b) =>
          (a, b, f)
        }
      }.toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("cnt"))
        .agg(min(struct(negate(col("cnt")), col("a"), col("b"))).as("w"))
        .head().getStruct(0)
      if (best == null) exhausted = true
      else {
        val pair = (best.getString(1), best.getString(2))
        merges += pair
        val prev = words
        words = prev.map { case (sym, f) =>
          (mergePair(sym.toVector, pair): Seq[String], f)
        }.localCheckpoint(true)
        prev.unpersist()
        made += 1
      }
    }
    words.unpersist()
    val ms = merges.result()
    val ids = (baseChars ++ ms.map { case (a, b) => a + b })
      .zipWithIndex.toMap
    Vocab(ms, ids)
  }

  private def mergePair(sym: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i < sym.length - 1 && sym(i) == pair._1 && sym(i + 1) == pair._2) {
        out += sym(i) + sym(i + 1); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Encode one pre-token to token ids: split to characters, then apply
    * the lowest-rank merge repeatedly until none applies (the standard
    * greedy-by-rank BPE application). Symbols absent from the vocabulary
    * (a character never seen in training) encode as -1.
    */
  def encodePretoken(word: String, vocab: Vocab): Array[Int] = {
    var sym = codePoints(word)
    var done = sym.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < sym.length - 1) {
        val r = vocab.ranks.getOrElse((sym(i), sym(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (sym(i), sym(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else {
        sym = mergePair(sym, bestPair)
        if (sym.length < 2) done = true
      }
    }
    sym.iterator.map(s => vocab.ids.getOrElse(s, -1)).toArray
  }

  /** Distributed BPE application: (id, token_ids, n_pretokens) per doc.
    *
    * The vocab is broadcast once; each partition keeps a pre-token →
    * ids memo (Zipf's law makes the hit rate high), so per-row cost is
    * regex pre-split + hash lookups. No shuffle — the plan is a pure
    * mapPartitions over the scan, exactly the [[Multimodal.stubDecode]]
    * batch shape.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: Vocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    // Option id: a null id (or a non-numeric id that casts to null) must
    // round-trip as null, not NPE in the primitive-Long deserializer
    val in: Dataset[(Option[Long], String)] =
      df.select(col(idCol).cast("long"), col(textCol))
        .as[(Option[Long], String)]
    in.mapPartitions { it =>
      val v = bc.value
      // bounded memo: Zipf's head dominates lookups, so a capped map keeps
      // the hit rate while bounding executor memory on adversarial
      // high-cardinality partitions (random strings, base64 blobs)
      val cache = mutable.HashMap.empty[String, Array[Int]]
      val maxCacheEntries = 1 << 17
      it.map { case (id, text) =>
        val pts = pretokens(if (text == null) "" else text)
        val ids = Array.newBuilder[Int]
        pts.foreach { w =>
          cache.get(w) match {
            case Some(e) => ids ++= e
            case None =>
              val e = encodePretoken(w, v)
              if (cache.size < maxCacheEntries) cache.update(w, e)
              ids ++= e
          }
        }
        (id, ids.result(), pts.length)
      }
    }.toDF(idCol, "token_ids", "n_pretokens")
  }
}
