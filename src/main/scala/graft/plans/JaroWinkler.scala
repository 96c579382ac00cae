package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen'd kernel — the bounded
  * fuzzy-match primitive Spark lacks (it ships `levenshtein` but no
  * Jaro family), used by the entity-resolution queries next to the
  * wildcard-blocked edit-distance join.
  *
  * Conventions are pinned to DuckDB's `jaro_winkler_similarity` so the
  * oracle replays cell-exact (each probed empirically, see
  * JaroWinklerSpec):
  *   - match window = max(⌊max(l1,l2)/2⌋ − 1, 0) (a window of 0 means
  *     only same-index characters can match — 'ab' vs 'ba' scores 0);
  *   - transpositions t = ⌊k/2⌋ where k counts order-mismatched matched
  *     characters (INTEGER halving: "abcxyz"/"bcaxyz" has k=3, t=1,
  *     giving 0.9444…, not the 0.9167 exact-half value);
  *   - either side empty, or m = 0 → 0.0 (not 1.0 for empty/empty);
  *   - Winkler boost sim + l·0.1·(1−sim), common prefix l ≤ 4, applied
  *     only when sim > 0.7.
  *
  * Operates on UTF-16 chars of the decoded string; callers that need
  * cross-engine byte/codepoint agreement should feed ASCII-projected
  * text (the q203/q206 discipline). Null-intolerant: null in → null out.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.plans.JaroWinkler.similarity($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Textbook Jaro–Winkler with the DuckDB conventions documented on the
    * expression class. O(l1·window) time, two small boolean scratch
    * arrays — per-row constant for the bounded prefixes the queries
    * feed it.
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val sm = new Array[Boolean](l1)
    val tm = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && s.charAt(i) == t.charAt(j)) {
          sm(i) = true; tm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var mism = 0
    i = 0
    while (i < l1) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val trans = mism / 2 // integer halving — the DuckDB convention
    val md = m.toDouble
    val sim = (md / l1 + md / l2 + (m - trans) / md) / 3.0
    if (sim > 0.7) {
      val maxp = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxp && s.charAt(l) == t.charAt(l)) l += 1
      sim + l * 0.1 * (1.0 - sim)
    } else sim
  }
}
