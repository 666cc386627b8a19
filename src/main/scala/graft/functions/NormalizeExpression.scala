package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization + casefold — the first step of any text
  * dedup/quality pipeline (the same logical string in composed vs
  * decomposed form, or differing only in case, must hash identically
  * before shingling/MinHash). Built on `java.text.Normalizer` (JDK ICU
  * subset) as a native expression with `doGenCode`, so the per-row call
  * stays inside whole-stage codegen rather than an interpreted UDF.
  * Map-side, zero shuffle; the fast path skips normalization entirely
  * when the string is already NFC (the overwhelmingly common case —
  * `Normalizer.isNormalized` is a cheap scan).
  */
case class NormalizeExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NormalizeExpression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NormalizeExpression.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeExpression {
  /** NFC-normalize then lowercase (casefold). Shared by interpreted eval
    * and generated code.
    */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfc =
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) str
      else java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(nfc.toLowerCase(java.util.Locale.ROOT))
  }
}
