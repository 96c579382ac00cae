package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `gram_wsum(tokens, weights)` — the DSIR/quality-classifier gram scorer
  * as ONE codegen'd expression: over the unigrams + strict word bigrams
  * of `tokens` (exactly [[graft.ops.Dsir.gramsOf]]'s gram set), sum the
  * weight of each gram's md5 bucket (`md5_prefix32(gram) mod
  * weights.length` — exactly [[graft.ops.Dsir.gramBucket]]) and count the
  * grams. Returns `array(step_sum, n_grams)`; the caller derives the
  * score (÷1e4 for DSIR, sigmoid margin for the classifier) with ordinary
  * codegen-able built-ins.
  *
  * Replaces the interpreted `aggregate` higher-order function the serving
  * path used through r20 (guide §4.1 / VERDICT r20 item 8): a HOF lambda
  * is evaluated by the interpreter once per gram — per-element Catalyst
  * eval, boxed struct accumulator, a GetArrayItem walk per lookup — where
  * this is a tight JVM loop over the token array with one md5 per gram
  * (the same digest count) and an O(1) long[] index. Values are
  * bit-identical: same gram strings, same md5 arithmetic, exact long
  * additions in any order.
  *
  * Null `tokens` (null text) yields null, as the HOF did. `weights` must
  * be a foldable array<long> literal covering the dense bucket domain
  * 0..length-1.
  */
case class GramWsum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "gram_wsum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable

  // the weight literal evaluates once per plan, not per row
  private lazy val wArr: Array[Long] = {
    require(right.foldable, "gram_wsum: weights must be a literal array")
    val ad = right.eval(InternalRow.empty)
    require(ad != null, "gram_wsum: weights literal must not be null")
    ad.asInstanceOf[ArrayData].toLongArray()
  }

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else GramWsum.compute(t.asInstanceOf[ArrayData], wArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("gramWsumWeights", wArr, "long[]")
    nullSafeCodeGen(ctx, ev, (toks, _) =>
      s"${ev.value} = graft.plans.GramWsum.compute($toks, $wRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GramWsum = copy(left = newLeft, right = newRight)
}

object GramWsum {
  private val SPACE = UTF8String.fromString(" ")

  /** Σ w(bucket(gram)) and gram count over unigrams + adjacent-pair
    * bigrams, ascending positions — the order [[graft.ops.Dsir.gramsOf]]
    * enumerates is different (all unigrams, then all bigrams) but long
    * addition is exact and commutative, so the sum is identical.
    */
  def compute(toks: ArrayData, w: Array[Long]): GenericArrayData = {
    val n = toks.numElements()
    val m = w.length
    var s = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      s += w((Md5Prefix32.hash(t) % m).toInt)
      if (i + 1 < n)
        s += w((Md5Prefix32.hash(
          UTF8String.concat(t, SPACE, toks.getUTF8String(i + 1))) % m).toInt)
      i += 1
    }
    new GenericArrayData(Array(s, if (n > 0) 2L * n - 1 else 0L))
  }
}
