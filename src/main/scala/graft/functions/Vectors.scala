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

  /** L2 norm, left-fold — order-stable across engines. */
  def l2norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))

  /** Left-fold dot product — order-stable, matches DuckDB list_reduce. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

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

  /** Pack `bits` sign-bits of hyperplane dot products into one int bucket
    * id for LSH table `table`.
    */
  def lshBucket(v: Column, table: Int, bits: Int, dims: Int): Column =
    (0 until bits).map { j =>
      val plane = array((0 until dims).map(d => lit(hyper(table, j, d))): _*)
      when(dot(v, plane) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** `(t, bucket)` struct array across `tables` LSH tables, for
    * `explode(...)` into one row per (vector, table).
    */
  def lshBuckets(v: Column, tables: Int, bits: Int, dims: Int): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("t"), lshBucket(v, t, bits, dims).as("bucket"))): _*)
}
