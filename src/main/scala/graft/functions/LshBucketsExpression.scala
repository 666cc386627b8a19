package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Sign-LSH bucket ids for an `array<double>` embedding: for each of
  * `tables` hash tables, packs `bits` hyperplane sign bits into one int.
  * One expression evaluation = `tables*bits*dims` fused multiply-adds in a
  * tight loop over a precomputed sign matrix.
  *
  * Why a custom Catalyst expression: the same math phrased as built-in
  * column functions is either `tables*bits` interpreted
  * `aggregate(zip_with(...))` folds (CodegenFallback higher-order
  * functions — an allocation per element per fold, ~100× slower), or a
  * statically unrolled add-chain whose ~20k-node expression tree blows up
  * optimizer/codegen memory. A native expression with `doGenCode` keeps
  * the projection inside whole-stage codegen at constant plan size.
  */
case class LshBucketsExpression(
    child: Expression,
    tables: Int,
    bits: Int,
    dims: Int)
  extends UnaryExpression {

  require(bits <= 30, "bucket id must fit in a positive Int")
  // callers pass a cast `array<double>` column (AbstractDataType /
  // ExpectsInputTypes are private[sql], so no declarative input check)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  /** Hyperplane signs, laid out flat as [t][j][d] — deterministic
    * (Vectors.hyper), identical on driver and every executor.
    */
  @transient private lazy val signs: Array[Double] = {
    val a = new Array[Double](tables * bits * dims)
    var i = 0
    var t = 0
    while (t < tables) {
      var j = 0
      while (j < bits) {
        var d = 0
        while (d < dims) { a(i) = Vectors.hyper(t, j, d); i += 1; d += 1 }
        j += 1
      }
      t += 1
    }
    a
  }

  /** The kernel; static so generated code can call it too. */
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      LshBucketsExpression.compute(
        input.asInstanceOf[ArrayData], signs, tables, bits, dims))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[]")
    val arrCls = classOf[GenericArrayData].getName
    val exprCls = LshBucketsExpression.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $arrCls($exprCls.compute($c, $signsRef, $tables, $bits, $dims));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketsExpression {
  /** Shared by interpreted eval and generated code. */
  def compute(v: ArrayData, signs: Array[Double],
              tables: Int, bits: Int, dims: Int): Array[Int] = {
    val vec = v.toDoubleArray()
    val n = math.min(dims, vec.length)
    val out = new Array[Int](tables)
    var i = 0
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        var s = 0.0
        var d = 0
        while (d < n) { s += signs(i + d) * vec(d); d += 1 }
        if (s > 0) bucket |= 1 << j
        i += dims
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}
