package graft

import graft.functions.{LshBucketsExpression, MinHashSigExpression, SimHashExpression, VecDotExpression}
import org.apache.spark.sql.{GraftCatalystBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native codegen
  * expressions as SQL functions, so the delegated-SQL surface (QUERY
  * blocks, `spark.sql`) can call the similarity/dedup kernels directly:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions     // cluster config, or
  *   SparkSession.builder.withExtensions(new GraftExtensions)
  *
  *   SELECT vec_dot(a.v, b.v) AS dot FROM ...
  *   SELECT graft_simhash(hs), minhash_sig(hs, 128), lsh_buckets(v, 32, 4, 64)
  * }}}
  *
  * Registered names:
  *  - `vec_dot(array<double>, array<double>) → double`
  *  - `graft_simhash(array<bigint>) → bigint` (64-bit SimHash of pre-hashed
  *    tokens)
  *  - `minhash_sig(array<bigint>, numPerm) → array<bigint>`
  *  - `lsh_buckets(array<double>, tables, bits, dims) → array<int>`
  *
  * Integer parameters must be literals — they size the generated kernels
  * at plan time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(fn: String)(e: Expression): Int = e match {
    case Literal(v, _) => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected a literal integer argument, got $other")
  }

  private def info(name: String, cls: Class[_], usage: String) =
    new ExpressionInfo(cls.getName, null, name)

  /** (identifier, info, builder) triples — the injectFunction shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", classOf[VecDotExpression],
        "vec_dot(a, b) - dot product of two array<double> vectors"),
      (args: Seq[Expression]) => VecDotExpression(args(0), args(1))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", classOf[SimHashExpression],
        "graft_simhash(hashes) - 64-bit SimHash over array<bigint> token hashes"),
      (args: Seq[Expression]) => SimHashExpression(args.head)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", classOf[MinHashSigExpression],
        "minhash_sig(hashes, numPerm) - MinHash signature over array<bigint>"),
      (args: Seq[Expression]) =>
        MinHashSigExpression(args(0), intLit("minhash_sig")(args(1)))),
    (FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets", classOf[LshBucketsExpression],
        "lsh_buckets(v, tables, bits, dims) - sign-LSH bucket ids for array<double>"),
      (args: Seq[Expression]) => LshBucketsExpression(args(0),
        intLit("lsh_buckets")(args(1)),
        intLit("lsh_buckets")(args(2)),
        intLit("lsh_buckets")(args(3)))),
    // Spark's own bloom-filter aggregate, which the runtime-filter
    // optimizer injects internally but does not expose in the registry.
    // Registering it makes the build side of an explicit bloom-pruned
    // semi-join (q63 pattern) writable as plain SQL; pairs with the
    // built-in (registered) `might_contain`.
    (FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
        "bloom_filter_agg(xxhash64(col), estItems, numBits) - bloom filter of the values"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))),
    (FunctionIdentifier("text_normalize"),
      info("text_normalize", classOf[graft.functions.NormalizeExpression],
        "text_normalize(s) - Unicode NFC normalization + casefold"),
      (args: Seq[Expression]) =>
        graft.functions.NormalizeExpression(args.head)),
    (FunctionIdentifier("might_contain"),
      info("might_contain",
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
        "might_contain(bloom, xxhash64(col)) - probe a bloom_filter_agg filter"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))),
  )

  /** Register on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      GraftCatalystBridge.registerFunction(spark, id.funcName, inf, builder)
    }
}
