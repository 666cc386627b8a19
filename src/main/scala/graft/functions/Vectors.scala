package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` embedding columns, shared by the
  * similarity-search ([[graft.queries.Similarity]]) and embedding-dedup
  * ([[graft.queries.Dedup]]) operators.
  *
  * Everything is a codegen'd column expression (`zip_with`/`aggregate`
  * folds) — no UDFs, no driver math. Dot products fold left-to-right so
  * DuckDB's `list_reduce` reproduces bit-identical doubles for the oracle
  * hash compare.
  */
object Vectors {

  /** Left-fold dot product — order-stable, matches DuckDB list_reduce.
    * Native codegen'd expression (see [[VecDotExpression]]); evaluated
    * once per candidate pair in verify stages, so it must not fall back
    * to interpreted higher-order functions.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftCatalystBridge.column(
      VecDotExpression(
        org.apache.spark.sql.GraftCatalystBridge.expression(a),
        org.apache.spark.sql.GraftCatalystBridge.expression(b)))

  /** L2 norm = sqrt(v·v), same left-to-right accumulation order. */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Deterministic ±1 hyperplane component for (table, bit, dim) — a
    * splitmix-style integer mix, reproducible everywhere with no RNG.
    * Random-hyperplane (sign) LSH: P[bit_a == bit_b] = 1 - angle/pi.
    */
  def hyper(table: Int, bit: Int, dim: Int): Double = {
    var z = table.toLong * 0x9E3779B97F4A7C15L + bit.toLong * 0xBF58476D1CE4E5B9L +
      dim.toLong * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** Bucket ids across all LSH tables as `array<int>` (index = table id;
    * pair with `posexplode` for one row per (vector, table)). Backed by
    * [[LshBucketsExpression]] — a native codegen'd Catalyst expression,
    * because `tables*bits` interpreted `aggregate(zip_with(...))` folds
    * per row are ~100× slower and a statically unrolled add-chain blows
    * up the plan (~20k expression nodes).
    */
  def lshBuckets(v: Column, tables: Int, bits: Int, dims: Int): Column =
    org.apache.spark.sql.GraftCatalystBridge.column(
      LshBucketsExpression(
        org.apache.spark.sql.GraftCatalystBridge.expression(v),
        tables, bits, dims))
}
