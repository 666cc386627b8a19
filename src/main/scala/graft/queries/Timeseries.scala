package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Zoh
import org.apache.spark.sql.functions._

/** Sketch + timeseries aggregates (SURVEY.md §2.6): QUANTILE, CDF, ZOH.
  *
  * QUANTILE: the reference streams a t-digest (transforms/quantile.go:24-72);
  * Spark's `percentile_approx` is the equivalent constant-memory sketch and
  * the 100 TB path. The oracle-checked entry uses exact `percentile` (both
  * engines interpolate over the sorted values) — exactness is affordable
  * because Spark distributes the sort; the sketch variant ships alongside
  * without an oracle (sketches are engine-specific by construction).
  *
  * CDF: reference transforms/cdf.go (t-digest CDF at a point). Exact rewrite:
  * count(x <= v) / count(x) — two codegen'd aggregates, no sketch needed.
  *
  * ZOH: see [[graft.functions.Zoh]].
  */
object Timeseries {
  import Tables.dec2

  // ZOH window [2024-01-10, 2024-01-25) UTC in unix micros.
  private val ZohStartUs = 1704844800000000L
  private val ZohEndUs = 1706140800000000L

  val entries: Seq[QueryDef] = Seq(

    QueryDef(
      "q03_quantile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price"))
    },

    // t-digest-style sketch path (no oracle: sketch internals differ by
    // engine; accuracy asserted in SketchSpec against the exact values).
    QueryDef.noOracle("q21_quantile_sketch") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50_qty"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_price"))
    },

    // HyperLogLog++ distinct-count sketch — the constant-memory path for
    // "how many unique users/documents" at 100 TB, where exact distinct
    // is a full shuffle of the key space. No oracle (sketch estimates are
    // engine-specific); SketchSpec pins the estimate within the rsd bound
    // of the exact counts. rsd 0.02 ⇒ ~1.5 KB of state per group,
    // independent of cardinality.
    QueryDef.noOracle("q62_approx_distinct") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("nd_parts"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("nd_orders"))
    },

    QueryDef(
      "q04_cdf",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(l_quantity) AS cdf_qty_25
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg((sum(when(col("l_quantity") <= 25, 1).otherwise(0)).cast("double")
          / count(col("l_quantity"))).as("cdf_qty_25"))
    },

    QueryDef(
      "q20_zoh",
      s"""WITH pts AS (
         |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         |         CAST(value AS DECIMAL(18,2)) AS v
         |  FROM events WHERE event_type = 'purchase'
         |), seg AS (
         |  SELECT user_id, t_us, v,
         |    greatest(t_us, $ZohStartUs) AS seg_start,
         |    least(coalesce(lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, v),
         |                   $ZohEndUs), $ZohEndUs) AS seg_end
         |  FROM pts)
         |SELECT user_id,
         |  CASE WHEN min(t_us) <= $ZohStartUs THEN
         |    round(CAST(SUM(CASE WHEN seg_end > seg_start
         |                  THEN v * CAST(seg_end - seg_start AS DECIMAL(16,0)) END) AS DOUBLE)
         |      / ${(ZohEndUs - ZohStartUs).toDouble}, 6)
         |  END AS zoh_mean
         |FROM seg GROUP BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
      Zoh.zohMean(ev, Seq("user_id"),
        unix_micros(col("ts")), dec2(col("value")), ZohStartUs, ZohEndUs)
    },
  )
}
