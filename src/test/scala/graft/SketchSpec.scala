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
