package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("q01 aggregates match hand-computed values") {
    val df = SparkEntry.queries("q01_agg_pricing_summary")(spark, sfDir)
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter("l_shipdate <= timestamp'1998-09-01 00:00:00'")
    val total = df.groupBy().sum("count_order").first().getLong(0)
    assert(total == li.count())
  }

  test("q10 window rank never exceeds 3 and starts at 1 per customer") {
    val df = SparkEntry.queries("q10_window_topk")(spark, sfDir)
    assert(df.filter("rn > 3 or rn < 1").count() == 0)
    val perCust = df.groupBy("o_custkey").min("rn")
    assert(perCust.filter("`min(rn)` != 1").count() == 0)
  }

  test("q13/q14/q15 set-op semantics") {
    val union = SparkEntry.queries("q13_union")(spark, sfDir)
    assert(union.count() == union.distinct().count(), "UNION must dedupe")
    val inter = SparkEntry.queries("q14_intersect")(spark, sfDir)
    assert(inter.count() <= union.count())
  }
}
