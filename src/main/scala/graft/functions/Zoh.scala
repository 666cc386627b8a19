package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Zero-order-hold time-weighted mean — the reference's one genuinely novel
  * aggregate (reference transforms/zoh.go:26-112, Timeseries.Mean
  * zoh.go:175-236).
  *
  * Semantics (matching the reference exactly):
  *   - the series is a step function: each point's value holds until the
  *     next point's time (and the last point holds forever);
  *   - result = ∫ value dt over [start, end] / (end - start);
  *   - NULL when end <= start, or when the group's earliest point is
  *     strictly after `start` (zoh.go:176-181).
  *
  * Two implementations:
  *
  *  1. [[zohMean]] — the scale path. A window `lead(time)` + decimal-exact
  *     weighted sum. One shuffle on the group key, no per-group buffering,
  *     stays inside whole-stage codegen: survives 100 TB, unlike the
  *     reference's sort-the-whole-group-in-memory reducer.
  *
  *  2. [[ZohAggregator]] — a faithful buffer-sort-fold `Aggregator`, usable
  *     as a first-class aggregate expression inside arbitrary `groupBy` /
  *     AQL AGGREGATE blocks. Memory ∝ group size (same contract as the
  *     reference); prefer [[zohMean]] when the plan shape allows it.
  */
object Zoh {

  /** Time-weighted ZOH mean per group over [startUs, endUs] (unix micros).
    *
    * @param timeUs  event-time column in unix microseconds (LongType)
    * @param value   value column; cast it to DECIMAL for bit-reproducible
    *                results across partitionings/engines
    * @return DataFrame[groupCols..., zoh_mean: Double]
    */
  def zohMean(df: DataFrame, groupCols: Seq[String], timeUs: Column,
              value: Column, startUs: Long, endUs: Long,
              resultName: String = "zoh_mean"): DataFrame = {
    require(groupCols.nonEmpty, "zohMean needs at least one group column")
    if (endUs <= startUs) {
      // degenerate window → NULL for every group (zoh.go:176-178)
      return df.groupBy(groupCols.map(col): _*)
        .agg(lit(null).cast("double").as(resultName))
    }
    // value as tie-break: duplicate timestamps otherwise leave lead()
    // nondeterministic across engines/partitionings
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(timeUs, value)
    val segEnd = least(coalesce(lead(timeUs, 1).over(w), lit(endUs)), lit(endUs))
    val segStart = greatest(timeUs, lit(startUs))
    val overlap = segEnd - segStart // micros each point's value holds in-window
    val withSeg = df
      .withColumn("__t", timeUs)
      .withColumn("__overlap", overlap)
      // decimal(16,0) holds any overlap < ~31 years of micros; keeps the
      // product inside decimal(38,_) so Spark doesn't round the scale away
      .withColumn("__weighted",
        value * col("__overlap").cast(org.apache.spark.sql.types.DecimalType(16, 0)))
    withSeg
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("__overlap") > 0, col("__weighted"))).as("__integral"),
        min(col("__t")).as("__min_t"))
      .select(groupCols.map(col) :+
        when(col("__min_t") <= startUs,
          // round(6): wide-decimal→double casts differ in the last ulp
          // across engines; a time-weighted mean needs no more precision
          round(col("__integral").cast("double") / lit((endUs - startUs).toDouble), 6))
          .as(resultName): _*)
  }

  /** Buffer of (timeUs, value) pairs; merged across partitions, sorted and
    * integrated at evaluation (reference zoh.go Return() → Timeseries.Mean).
    */
  final class ZohAggregator(startUs: Long, endUs: Long)
      extends Aggregator[(Long, Double), ArrayBuffer[(Long, Double)], java.lang.Double] {

    override def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty

    override def reduce(b: ArrayBuffer[(Long, Double)],
                        in: (Long, Double)): ArrayBuffer[(Long, Double)] = {
      b += in; b
    }

    override def merge(a: ArrayBuffer[(Long, Double)],
                       b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
      a ++= b; a
    }

    override def finish(buf: ArrayBuffer[(Long, Double)]): java.lang.Double = {
      if (endUs <= startUs || buf.isEmpty) return null
      val pts = buf.sortBy(_._1)
      if (pts.head._1 > startUs) return null // series starts after window
      var integral = 0.0
      var i = 0
      while (i < pts.length) {
        val segStart = math.max(pts(i)._1, startUs)
        val segEnd =
          if (i + 1 < pts.length) math.min(pts(i + 1)._1, endUs) else endUs
        if (segEnd > segStart) integral += pts(i)._2 * (segEnd - segStart)
        i += 1
      }
      integral / (endUs - startUs).toDouble
    }

    override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
      Encoders.kryo[ArrayBuffer[(Long, Double)]]
    override def outputEncoder: Encoder[java.lang.Double] =
      Encoders.DOUBLE
  }

  /** `zoh_agg(timeUs, value)` as a Column aggregate for groupBy/AGGREGATE. */
  def zohAgg(timeUs: Column, value: Column, startUs: Long, endUs: Long): Column =
    udaf(new ZohAggregator(startUs, endUs),
         Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      .apply(timeUs, value)
}
