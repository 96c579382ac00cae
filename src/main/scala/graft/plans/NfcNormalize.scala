package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonicalization step of web-corpus text cleanup (decomposed
  * `e + U+0301` and composed `é` must dedup/fingerprint/tokenize
  * identically). Spark ships no normalization builtin; a Scala UDF would
  * break whole-stage codegen on the hottest scan in the pipeline, so
  * this is the (b)-tier extension: one `UnaryExpression` whose generated
  * code calls `java.text.Normalizer` directly (UAX #15, the same
  * algorithm DuckDB's `nfc_normalize` implements — which is what makes
  * the q54 oracle cell-exact).
  *
  * Registered as `nfc_normalize(str)` by [[GraftExtensions]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  // the GraftExtensions builder casts its argument to string, so the
  // child is always StringType by construction (the DotProduct pattern —
  // AbstractDataType/ImplicitCastInputTypes are private[sql])
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
