package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Custom stateful streaming: `mapGroupsWithState` over the events stream
  * — the Structured Streaming surface for state the built-in windowed
  * aggregations can't express (per-key accumulators, custom eviction).
  * The reference has no unbounded streaming at all (SURVEY §2.10); this
  * pins the beyond-parity path: the same code runs against Kafka/file
  * drops unchanged.
  */
class StreamingStateSpec extends AnyFunSuite {
  import SparkTestSession._

  // ts physical type varies by generator round (nanos-as-long or
  // TIMESTAMP_NTZ micros — see Tables.load); this test never touches ts,
  // so probe the batch footer and declare whatever is there
  private def rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", spark.read.parquet(s"$sfDir/events.parquet")
      .schema("ts").dataType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("mapGroupsWithState per-user purchase totals == batch groupBy") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]

    // state: (n_events, total_value) per user, updated per micro-batch
    val totals = stream.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          (user, n, v)
      }.toDF("user_id", "n", "total")

    val viewName = s"state_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = totals.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(viewName)
      .start()
    try q.processAllAvailable() finally q.stop()

    // update-mode memory sink appends every state revision; the final
    // revision per user (max n) is the answer
    val got = spark.table(viewName)
      .groupBy("user_id")
      .agg(max(struct(col("n"), col("total"))).as("s"))
      .select(col("user_id"), col("s.n").as("n"), col("s.total").as("total"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap

    val want = Tables.load(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap

    assert(got.keySet == want.keySet)
    got.foreach { case (u, (n, v)) =>
      assert(n == want(u)._1, s"user $u count")
      assert(math.abs(v - want(u)._2) < 1e-6, s"user $u total")
    }
  }

  test("q61 streaming ZOH equals batch ZOH (q20) exactly") {
    def asMap(name: String): Map[Long, Option[Double]] =
      SparkEntry.queries(name)(spark, sfDir)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val streaming = asMap("q61_stream_zoh")
    val batch = asMap("q20_zoh")
    assert(streaming.keySet == batch.keySet)
    streaming.foreach { case (u, v) =>
      assert(v == batch(u), s"user $u: stream=$v batch=${batch(u)}")
    }
  }
}
