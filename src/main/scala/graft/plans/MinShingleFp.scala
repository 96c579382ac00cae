package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum md5-prefix32 hash over the `gram`-char shingles of a string,
  * in one native pass: `min_shingle_fp(text, gram) -> long` — the
  * winnowing-style whole-document fingerprint behind
  * [[graft.ops.TextOps.minShingleFingerprint]] (q30).
  *
  * Bit-identical to the declarative spelling
  * `array_min(transform(charNgrams(text, gram), md5_prefix32))`
  * (spec-pinned in OpsSpec on random Unicode, and the q30 DuckDB oracle
  * replays the identical arithmetic), but it materializes NOTHING: the
  * declarative form allocates a per-row array of every shingle — O(chars)
  * UTF8Strings per document — before reducing it to one long, which made
  * q30 the suite's worst honest-timing outlier (25.4 s noop-sink vs
  * 0.11 s under count(); r14 verdict). This walks the document's bytes
  * once, hashing each shingle straight out of the backing buffer
  * (code-point offsets, so `substr` semantics — and the oracle — hold on
  * non-ASCII) and keeping a running min. Same shape as [[WinnowFps]]
  * minus the sliding window.
  *
  * `gram` must be a foldable positive int. Null text or fewer than
  * `gram` chars → null (the declarative form's `array_min(array())`).
  */
case class MinShingleFp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "min_shingle_fp"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"min_shingle_fp expects (string, int), got " +
          s"(${left.dataType}, ${right.dataType})")
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "min_shingle_fp gram must be foldable")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  // nullSafeEval may return null: a non-null text shorter than `gram`
  // chars has no shingles, matching array_min(empty) = null
  override protected def nullSafeEval(text: Any, g: Any): Any =
    MinShingleFp.fp(text.asInstanceOf[UTF8String], g.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, g) => s"""
      java.lang.Long ${ev.value}_r = graft.plans.MinShingleFp.fp($t, $g);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.longValue();
      }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MinShingleFp =
    copy(left = newLeft, right = newRight)
}

object MinShingleFp {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def charLen(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0x80) 1
    else if (u < 0xE0) 2 // 0xC0-0xDF (continuations never lead valid UTF-8)
    else if (u < 0xF0) 3
    else 4
  }

  /** Boxed so the "no shingles" case is a real null (codegen and eval
    * both read it as the expression's null).
    */
  def fp(text: UTF8String, gram: Int): java.lang.Long = {
    require(gram > 0, "min_shingle_fp gram must be positive")
    val bytes = text.getBytes
    val nBytes = bytes.length
    var nChars = 0
    var i = 0
    while (i < nBytes) { i += charLen(bytes(i)); nChars += 1 }
    val nGrams = nChars - gram + 1
    if (nGrams <= 0) return null
    // code-point start offsets (+ end sentinel): grams count CHARS, so
    // substr/charNgrams semantics hold byte-for-byte on non-ASCII
    val offs = new Array[Int](nChars + 1)
    i = 0; var c = 0
    while (i < nBytes) { offs(c) = i; i += charLen(bytes(i)); c += 1 }
    offs(nChars) = nBytes
    val md = digest.get()
    val d = new Array[Byte](16) // reused digest buffer: zero per-gram alloc
    var min = Long.MaxValue
    i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, offs(i), offs(i + gram) - offs(i))
      md.digest(d, 0, 16)
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }
}
