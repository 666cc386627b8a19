package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash from pre-hashed tokens (`array<bigint>`), the classic
  * Charikar construction over the token multiset: bit i of the result is
  * 1 iff Σ over tokens of (±1, sign = bit i of the token hash) > 0.
  * One pass over the hashes with a 64-counter array — replaces 64
  * interpreted `aggregate(...)` folds (CodegenFallback) per row.
  */
case class SimHashExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHashExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHashExpression.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpression {
  /** Shared by interpreted eval and generated code. */
  def compute(hashes: ArrayData): Long = {
    val hs = hashes.toLongArray()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (cnt(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
