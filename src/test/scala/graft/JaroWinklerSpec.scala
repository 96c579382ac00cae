package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.JaroWinkler

/** Pins the native jaro_winkler kernel to DuckDB's
  * `jaro_winkler_similarity` conventions, each value probed against
  * duckdb 1.x directly (q206 then re-validates the whole corpus
  * pairwise at the driver gate).
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("textbook values match the DuckDB probes bit-for-bit") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("aaaa", "aaab") == 0.8833333333333334)
    assert(jw("abcd", "abcx") == 0.8833333333333334)
    assert(jw("ab", "abcdefghijklmnop") == 0.7666666666666667)
  }

  test("edge conventions: empty -> 0, window 0, m=0, case-sensitive") {
    assert(jw("", "") == 0.0) // NOT 1.0 — the DuckDB convention
    assert(jw("a", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: only same-index matches
    assert(jw("ABC", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "a") == 1.0)
  }

  test("transpositions halve as INTEGERS (floor), not exactly") {
    // m=6, 3 order-mismatched matches -> t = 3/2 = 1 (floor), giving
    // 0.9444...; exact halving (t=1.5) would give 0.9166...
    // jw == jaro here: first chars differ so the boost prefix is 0
    assert(jw("abcxyz", "bcaxyz") == 0.9444444444444445)
  }

  test("boost applies only above 0.7 and caps the prefix at 4") {
    // jaro 0.6667 < 0.7: the shared 'ab' prefix must NOT boost
    assert(jw("abcdex", "abxxxx") == 0.6666666666666666)
    // 5-char shared prefix: boost uses l=4, not 5 (m=5, jaro 0.75;
    // DuckDB probe: jaro_winkler_similarity = 0.85)
    val sim = jw("abcdefgh", "abcdexyz")
    val jaro = (5.0 / 8 + 5.0 / 8 + (5 - 0) / 5.0) / 3.0
    assert(jaro == 0.75 && sim == jaro + 4 * 0.1 * (1.0 - jaro))
    assert(sim == 0.85)
  }

  test("the SQL-registered kernel runs codegen'd inside a projection " +
      "and is null-intolerant") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      (null, "x")).toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b")).as("jw"))
    val got = df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(Some(0.9611111111111111),
      Some(0.8133333333333332), None))
  }
}
