package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-function registration of the native codegen kernels
  * (SparkSessionExtensions production path; registry injection here).
  */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  GraftExtensions.register(spark)

  test("vec_dot is callable from SQL and matches the Column API") {
    val d = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(d == 32.0)
  }

  test("graft_simhash from SQL equals the Column-API simhash") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")))
      .toDF("id", "text")
    df.createOrReplaceTempView("simhash_in")
    val viaSql = spark.sql(
      """SELECT id, graft_simhash(transform(
        |  filter(split(text, ' '), t -> t <> ''),
        |  t -> xxhash64(t))) AS sh FROM simhash_in""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = df.select(col("id"),
        graft.functions.Text.simhashFromHashes(
          graft.functions.Text.hashedTokens(
            graft.functions.Text.tokens(col("text")))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("minhash_sig returns numPerm elements; literal arity enforced") {
    val sig = spark.sql(
      "SELECT minhash_sig(array(xxhash64('a'), xxhash64('b')), 16) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 16)
    val e = intercept[Exception](spark.sql(
      "SELECT minhash_sig(array(1L), cast(rand() * 4 AS int) + 1)").collect())
    assert(e.getMessage.contains("literal"))
  }

  test("lsh_buckets returns one bucket per table, stable across calls") {
    val q = "SELECT lsh_buckets(array(0.1d, -0.5d, 0.9d), 8, 4, 3) AS b"
    val a = spark.sql(q).head().getSeq[Int](0)
    val b = spark.sql(q).head().getSeq[Int](0)
    assert(a.length == 8 && a == b)
    assert(a.forall(x => x >= 0 && x < 16))
  }

  test("text_normalize: composed == decomposed, casefolded; ASCII fast path") {
    // \u00E9 composed vs e+\u0301 decomposed must normalize identically;
    // uppercase folds; plain ASCII passes through unchanged
    val rows = spark.sql(
      "SELECT text_normalize('Caf\u00e9') AS a, " +
        "text_normalize('Cafe\u0301') AS b, " +
        "text_normalize('Hello World') AS c").head()
    assert(rows.getString(0) == rows.getString(1))
    assert(rows.getString(0) == "caf\u00e9")
    assert(rows.getString(2) == "hello world")
  }

  test("bloom_filter_agg + might_contain: no false negatives from SQL") {
    spark.range(0, 1000).createOrReplaceTempView("bloom_keys")
    val missed = spark.sql(
      """SELECT count(*) AS missed FROM bloom_keys
        |WHERE NOT might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(id), 1000L, 65536L)
        |   FROM bloom_keys),
        |  xxhash64(id))""".stripMargin).head().getLong(0)
    assert(missed == 0L)
  }
}
