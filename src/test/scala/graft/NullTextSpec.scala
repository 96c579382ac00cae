package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TextOps

/** Degenerate-text pins for the attribute-based repetition metrics
  * (r9's rewrite of topTokenFrac/dupBigramFrac), matching the DuckDB
  * oracle twins exactly: null text gives a NULL top-token fraction
  * (the oracle's `CASE len(toks) = 0` is not-true for NULL → NULL
  * arithmetic) but a 0.0 dup-bigram fraction (the oracle's
  * `CASE len(toks) >= 2 … ELSE []` sends NULL through its ELSE);
  * empty and sub-bigram docs yield 0.0, and the sorted-run max must
  * equal the naive most-frequent count.
  */
class NullTextSpec extends SparkSpec {
  test("repetition metrics on null/empty/one-token/repetitive text") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val rows = scala.jdk.CollectionConverters.SeqHasAsJava(
      Seq(Row(1L, null), Row(2L, ""), Row(3L, "one"),
        Row(4L, "a a b"), Row(5L, "x y x y x"))).asJava
    val df = spark.createDataFrame(new java.util.ArrayList[Row](rows), schema)
    val out = df
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
      .withColumn("__bg", TextOps.bigramsOf(col("__toks")))
      .select(col("doc_id"),
        TextOps.topTokenFracOf(col("__toks")).as("ttf"),
        TextOps.dupBigramFracOf(col("__bg")).as("dbf"))
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(1)) // null text: ttf null...
    assert(out(0).getDouble(2) == 0.0) // ...but dbf 0.0 (oracle's ELSE [])
    assert(out(1).getDouble(1) == 0.0 && out(1).getDouble(2) == 0.0)
    assert(out(2).getDouble(1) == 1.0 && out(2).getDouble(2) == 0.0)
    assert(math.abs(out(3).getDouble(1) - 2.0 / 3) < 1e-15)
    assert(out(3).getDouble(2) == 0.0) // "a a"/"a b" distinct
    // "x y x y x": top token x = 3/5; bigrams xy yx xy yx -> 2 dups of 4
    assert(math.abs(out(4).getDouble(1) - 0.6) < 1e-15)
    assert(out(4).getDouble(2) == 0.5)
  }

  test("round-9 dedup ops on null/empty/tiny text: no throw, sane sets") {
    import graft.ops.Dedup
    val rows = Seq(
      Row(1L, null.asInstanceOf[String]),
      Row(2L, ""),
      Row(3L, "   "),
      Row(4L, "one"),
      Row(5L, "a b c d e f g h i j k l"),
      Row(6L, "a b c d e f g h i j k l")) // dup of 5
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    // winnowing: degenerate docs produce no fingerprints, dup pair found
    val wp = Dedup.winnowingPairs(df, "doc_id", "text",
        gram = 4, window = 2, maxFpDf = 32, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wp == Set((5L, 6L)), s"winnowing: $wp")
    // word-set: NULL text propagates to a NULL fingerprint (its own
    // singleton class — nulls are not silently conflated with empty),
    // while empty and whitespace-only docs share the empty-vocabulary
    // fingerprint; the dup pair collides
    val ws = Dedup.wordSetDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ws(5L) == 2L && ws(6L) == 2L)
    assert(ws(1L) == 1L, s"null text not a singleton class: ${ws(1L)}")
    assert(ws(2L) == 2L && ws(3L) == 2L) // empty == whitespace-only
    // prefix-jaccard: degenerate docs drop out, dup pair at J = 1
    val pj = Dedup.prefixJaccardPairs(df, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(pj.toSeq == Seq((5L, 6L, 1.0)), s"prefix: ${pj.toSeq}")
  }
}
