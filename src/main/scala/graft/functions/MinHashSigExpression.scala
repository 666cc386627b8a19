package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over pre-hashed shingles (`array<bigint>`): for each
  * of `numPerm` permutations s, `min over h of xxhash64(h, seed = s)`.
  * One expression evaluation = `numPerm * |shingles|` xxhash64-of-long
  * rounds in a tight loop (Spark's own XXH64), inside whole-stage codegen.
  *
  * Replaces `array(128 × array_min(transform(hs, xxhash64)))`: those
  * higher-order functions are CodegenFallback — interpreted, with a lambda
  * binding and an allocation per element per permutation — and dominated
  * the MinHash+LSH dedup runtime (SURVEY.md §2: dedup family).
  */
case class MinHashSigExpression(child: Expression, numPerm: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSigExpression.compute(input.asInstanceOf[ArrayData], numPerm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrCls = classOf[GenericArrayData].getName
    val cls = MinHashSigExpression.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $arrCls($cls.compute($c, $numPerm));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpression {
  /** Shared by interpreted eval and generated code. */
  def compute(hashes: ArrayData, numPerm: Int): Array[Long] = {
    val hs = hashes.toLongArray()
    val out = new Array[Long](numPerm)
    var s = 0
    while (s < numPerm) {
      var m = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val h = XXH64.hashLong(hs(i), s)
        if (h < m) m = h
        i += 1
      }
      out(s) = m
      s += 1
    }
    out
  }
}
