package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.time.Instant

/** Semantics unit tests for the advanced operators, on crafted inputs the
  * synthetic tables can't guarantee (timestamp ties, empty groups). The
  * query builders read `$dir/events.parquet`, so each test writes a tiny
  * corpus to a temp dir and points the registered builder at it.
  */
class AdvancedSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def nanos(s: String): Long =
    Instant.parse(s).getEpochSecond * 1000000000L

  test("q24 as-of: <= tie visible, no-prior dropped, per-user isolation") {
    val tmp = Files.createTempDirectory("graft_asof").toString
    Seq(
      // user 1: click and purchase at the SAME instant — click visible (<=)
      (1L, nanos("2020-01-01T10:00:00Z"), 1L, "click", 0.0, "{}"),
      (2L, nanos("2020-01-01T10:00:00Z"), 1L, "purchase", 1.0, "{}"),
      // user 2: purchase BEFORE any click — must be dropped
      (3L, nanos("2020-01-01T09:00:00Z"), 2L, "purchase", 1.0, "{}"),
      (4L, nanos("2020-01-01T11:00:00Z"), 2L, "click", 0.0, "{}"),
      // user 2: later purchase sees 11:00, not user 1's clicks
      (5L, nanos("2020-01-01T12:00:00Z"), 2L, "purchase", 1.0, "{}"),
      // noise: other event types never match
      (6L, nanos("2020-01-01T11:30:00Z"), 2L, "view", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val out = SparkEntry.queries("q24_asof_join")(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> r.getTimestamp(2).toInstant.toString)
      .toMap
    assert(out == Map(
      2L -> "2020-01-01T10:00:00Z",
      5L -> "2020-01-01T11:00:00Z"))
  }

  test("q26 sliding windows: each event lands in exactly two hop windows") {
    val tmp = Files.createTempDirectory("graft_hop").toString
    Seq(
      (1L, nanos("2020-01-01T10:15:00Z"), 1L, "click", 2.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val out = SparkEntry.queries("q26_sliding_window")(spark, tmp)
      .collect()
      .map(r => r.getTimestamp(0).toInstant.toString)
      .sorted
    // 1h window, 30min slide, epoch-aligned: starts 09:30 and 10:00
    assert(out.toSeq == Seq("2020-01-01T09:30:00Z", "2020-01-01T10:00:00Z"))
  }

  test("q48 salted join result equals the plain join") {
    import org.apache.spark.sql.functions._
    val salted = SparkEntry.queries("q48_salted_join")(spark, sfDir)
    val plain = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"))
    def toMapOf(rows: Array[org.apache.spark.sql.Row]): Map[Long, Long] =
      rows.map(r => r.getAs[Number](0).longValue ->
        r.getAs[Number](1).longValue).toMap
    val s = toMapOf(salted.select("s_nationkey", "n_items").collect())
    val p = toMapOf(plain.collect())
    assert(s == p)
  }

  test("q66 split: stable across runs, ~80/10/10, key-only dependence") {
    import org.apache.spark.sql.functions._
    val a = SparkEntry.queries("q66_split_assign")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = SparkEntry.queries("q66_split_assign")(spark, sfDir)
      .repartition(7) // different partitioning must not move any document
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    info(s"fractions: $frac")
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06)
  }
}
