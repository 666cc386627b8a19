package graft

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy floor for the sketch-based quantile path (q21): the
  * percentile_approx sketch must land within a small relative tolerance of
  * q03's exact percentiles on the same data. Sketch internals are
  * engine-specific (no SQL oracle possible), so this spec is q21's
  * correctness gate, mirroring the recall specs the other no-oracle
  * queries (q33/q35/q46) have in PipelineSpec.
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q21 sketch percentiles within 1% of q03 exact percentiles") {
    val exact = SparkEntry.queries("q03_quantile")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(3))).toMap
    val sketch = SparkEntry.queries("q21_quantile_sketch")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(sketch.keySet == exact.keySet)
    def relErr(approx: Double, ex: Double): Double =
      if (ex == 0.0) math.abs(approx) else math.abs(approx - ex) / math.abs(ex)
    sketch.foreach { case (flag, (p50, p95)) =>
      val (e50, e95) = exact(flag)
      info(f"$flag p50 sketch=$p50%.4f exact=$e50%.4f  p95 sketch=$p95%.4f exact=$e95%.4f")
      assert(relErr(p50, e50) <= 0.01, s"$flag p50 off: $p50 vs $e50")
      assert(relErr(p95, e95) <= 0.01, s"$flag p95 off: $p95 vs $e95")
    }
  }

  test("q127 bottom-k sample quantiles within the order-statistic bound") {
    // the estimator's error model: the ceil(q·k)-th order statistic of a
    // k = 256 uniform sample sits at true CDF position q ± ~sqrt(q(1-q)/k)
    // (±0.031 at q=0.5). Check |CDF(est) − q| ≤ 0.12 (≈ 3.8 sigma) per
    // group against the raw data — a distribution-free bound, unlike a
    // relative-value tolerance. Deterministic md5 sampling makes the
    // assertion stable, not flaky.
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    val est = SparkEntry.queries("q127_sample_quantile")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val li = Tables.load(spark, sfDir, "lineitem")
    est.foreach { case (flag, (p50, p90)) =>
      val Seq(c50, c90, n) = li.where(col("l_returnflag") === flag)
        .agg(sum(when(col("l_quantity") <= p50, 1L).otherwise(0L)),
          sum(when(col("l_quantity") <= p90, 1L).otherwise(0L)),
          count(lit(1)))
        .head().toSeq.map(_.asInstanceOf[Long]).toSeq
      val (cdf50, cdf90) = (c50.toDouble / n, c90.toDouble / n)
      info(f"$flag p50_est=$p50%.2f cdf=$cdf50%.3f  p90_est=$p90%.2f cdf=$cdf90%.3f")
      assert(math.abs(cdf50 - 0.5) <= 0.12, s"$flag p50 off: cdf=$cdf50")
      assert(math.abs(cdf90 - 0.9) <= 0.12, s"$flag p90 off: cdf=$cdf90")
    }
  }

  test("q62 HLL distinct estimates within 3x rsd of exact counts") {
    import org.apache.spark.sql.functions._
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_orderkey")).as("nd_orders"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("q62_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (parts, orders)) =>
      val (eParts, eOrders) = exact(flag)
      info(s"$flag parts approx=$parts exact=$eParts orders approx=$orders exact=$eOrders")
      assert(math.abs(parts - eParts).toDouble / eParts <= 0.06,
        s"$flag nd_parts off: $parts vs $eParts")
      assert(math.abs(orders - eOrders).toDouble / eOrders <= 0.06,
        s"$flag nd_orders off: $orders vs $eOrders")
    }
  }
}
