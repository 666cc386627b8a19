package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two `array<double>` columns as one tight codegen'd
  * loop. Accumulates left-to-right in double precision — bit-identical to
  * the `aggregate(zip_with(...))` fold it replaces and to DuckDB's
  * `list_reduce`, so oracle hash compares are unaffected.
  *
  * Why native: similarity/dedup verify stages evaluate a dot per
  * *candidate pair* (millions of rows after LSH blocking) and the
  * higher-order-function formulation is CodegenFallback — interpreted,
  * one allocation per element. This expression stays inside whole-stage
  * codegen at ~64 fused multiply-adds per row.
  */
case class VecDotExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecDotExpression.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VecDotExpression.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDotExpression {
  /** Shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }
}
