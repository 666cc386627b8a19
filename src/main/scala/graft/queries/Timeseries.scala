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

    // ---- Bottom-k sample quantiles: the PORTABLE approximate-quantile
    // sketch, closing q21's no-oracle gap the way q126 closed q33's. A
    // per-group uniform sample is the rows with the k smallest
    // md5-derived hashes of their unique row key (the q69/q111
    // engine-portable trick) — bounded state (k values per group),
    // associatively mergeable (k-smallest of a union = k-smallest of the
    // per-partition k-smallest sets: the theta-sketch identity q119
    // proves), and bit-identically replayable in DuckDB, so the gate is
    // hash-exact INCLUDING the sampling error. Quantile = nearest-rank
    // (ceil(q·n)-th order statistic) over the sample's DECIMAL values —
    // integer rank arithmetic, no interpolation to diverge on.
    //
    // Scale shape: the per-group k-smallest runs as q77's salted
    // two-phase top-N (16-way salted partial windows cut each slice to
    // k, then the final per-group window sees ≤ 16k rows), so no
    // reducer ever sorts a whole group; the quantile pass runs on
    // |groups|·k rows. SketchSpec pins the estimator's accuracy against
    // q03's exact quantiles (|CDF(est) − q| within the order-statistic
    // bound for k = 256).
    QueryDef(
      "q127_sample_quantile",
      """WITH h AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS v,
        |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |      CAST(l_linenumber AS VARCHAR)), 1, 13)) AS BIGINT) AS hv
        |  FROM lineitem),
        |k AS (
        |  SELECT l_returnflag, v FROM h
        |  QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY hv) <= 256),
        |r AS (
        |  SELECT l_returnflag, v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM k)
        |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_sample,
        |  CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |    THEN v END) AS DOUBLE) AS p50_est,
        |  CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
        |    THEN v END) AS DOUBLE) AS p90_est
        |FROM r GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val K = 256
      val h = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"),
          Tables.dec2(col("l_quantity")).as("v"),
          conv(substring(md5(concat_ws(":",
            col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"))), 1, 13), 16, 10)
            .cast("bigint").as("hv"))
      // salted partial top-k: each (group, salt) slice cuts to K rows
      // before the final per-group window — q77's two-phase shape
      val salted = Window.partitionBy(col("l_returnflag"),
        pmod(col("hv"), lit(16))).orderBy(col("hv"))
      val perGroup = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("hv"))
      val sample = h
        .withColumn("__srn", row_number().over(salted))
        .where(col("__srn") <= K)
        .withColumn("__rn", row_number().over(perGroup))
        .where(col("__rn") <= K)
        .select(col("l_returnflag"), col("v"))
      val byV = Window.partitionBy(col("l_returnflag")).orderBy(col("v"))
      val cnt = Window.partitionBy(col("l_returnflag"))
      sample
        .withColumn("rn", row_number().over(byV))
        .withColumn("n", count(lit(1)).over(cnt))
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).cast("bigint").as("n_sample"),
          max(when(col("rn") === ceil(lit(0.5) * col("n")).cast("bigint"),
            col("v"))).cast("double").as("p50_est"),
          max(when(col("rn") === ceil(lit(0.9) * col("n")).cast("bigint"),
            col("v"))).cast("double").as("p90_est"))
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

    // ---- Linear-interpolation resampling: each user's irregular purchase
    // series re-sampled onto a regular 1-day grid, values linearly
    // interpolated between the surrounding observations (interior grid
    // points only — ZOH's forward-fill sibling for gap-filling sensor
    // data). Shape: grid rows are generated map-side (explode(sequence))
    // off the |users| frame and UNIONED with the observations, then ONE
    // window shuffle on user_id finds both neighbours via
    // last/first(ignoreNulls) over preceding/following frames — no
    // self-join, no per-grid-point probe. Interpolation arithmetic runs
    // the identical IEEE expression on both engines over exact inputs
    // (decimal-quantized values, integer micros), so results hash-match.
    // At 100 TB: state per user is one running observation either side,
    // grid fan-out is bounded by the window/step ratio, and the single
    // exchange carries points + grid rows shuffled on user_id.
    QueryDef(
      "q92_interpolate", {
        val step = 86400000000L
        s"""WITH pts AS (
           |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
           |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v, 1 AS is_obs
           |  FROM events WHERE event_type = 'purchase'),
           |grid AS (
           |  SELECT user_id, unnest(generate_series($ZohStartUs,
           |    ${ZohEndUs - 1}, $step)) AS t,
           |    CAST(NULL AS DOUBLE) AS v, 0 AS is_obs
           |  FROM (SELECT DISTINCT user_id FROM pts)),
           |u AS (SELECT * FROM pts UNION ALL SELECT * FROM grid),
           |w AS (
           |  SELECT *,
           |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
           |      ORDER BY t, is_obs DESC, v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           |    last_value(CASE WHEN is_obs = 1 THEN t END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY t, is_obs DESC, v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
           |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
           |      ORDER BY t, is_obs DESC, v
           |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           |    first_value(CASE WHEN is_obs = 1 THEN t END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY t, is_obs DESC, v
           |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
           |  FROM u)
           |SELECT user_id, t AS grid_us,
           |  round(CASE WHEN nt = pt THEN pv
           |    ELSE pv + (nv - pv) * CAST(t - pt AS DOUBLE)
           |      / CAST(nt - pt AS DOUBLE) END, 6) AS v_interp
           |FROM w WHERE is_obs = 0 AND pt IS NOT NULL AND nt IS NOT NULL""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val step = 86400000000L
      val pts = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          dec2(col("value")).cast("double").as("v"), lit(1).as("is_obs"))
      val grid = pts.select("user_id").distinct()
        .select(col("user_id"),
          explode(sequence(lit(ZohStartUs), lit(ZohEndUs - 1), lit(step)))
            .as("t"),
          lit(null).cast("double").as("v"), lit(0).as("is_obs"))
      // v as the final tiebreak makes the order total for duplicate
      // observation timestamps (nanos→micros truncation can collide), so
      // pv/nv are engine-deterministic; grid rows never tie (unique t per
      // user, and obs-vs-grid ties resolve on is_obs) so v's NULLs never
      // decide an ordering on either engine.
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("is_obs").desc, col("v"))
      val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsT = when(col("is_obs") === 1, col("t"))
      pts.unionByName(grid)
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pt", last(obsT, ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nt", first(obsT, ignoreNulls = true).over(wNext))
        .where(col("is_obs") === 0 && col("pt").isNotNull && col("nt").isNotNull)
        .select(col("user_id"), col("t").as("grid_us"),
          round(when(col("nt") === col("pt"), col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv"))
              * (col("t") - col("pt")).cast("double")
              / (col("nt") - col("pt")).cast("double")), 6).as("v_interp"))
    },

    // ---- Per-key trend detection: least-squares slope of value over time
    // for each user, from exact moment sums. x is centered per user
    // (seconds since the user's first event — keeps Σx² inside BIGINT at
    // gate scale; the 100 TB swap is DECIMAL(38,0) sums, same plan) and y
    // rides DECIMAL(18,6), so all four sums are exact and order-
    // independent; the closed-form slope is then computed in doubles from
    // identical exact inputs on both engines. One shuffle on user_id: the
    // centering window and the moment aggregation share the partitioning.
    // No regr_slope built-in on either side — their double accumulation
    // is partition-order-dependent and would not hash-match.
    // Slope is reported PER DAY (×86400): per-second slopes at gate scale
    // are O(1e-6) — the same order as the round(…,6) quantum — so engine-
    // level round-on-double differences (Spark exact-BigDecimal HALF_UP vs
    // DuckDB scaled nearbyint) flip boundary digits. Per-day values are
    // O(0.1) with ~5 significant digits above the quantum; double ULP
    // error (~1e-17) can no longer reach the 6th decimal.
    QueryDef(
      "q93_trend_slope",
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
        |    CAST(value AS DECIMAL(18,6)) AS y
        |  FROM events),
        |c AS (
        |  SELECT user_id, sec - min(sec) OVER (PARTITION BY user_id) AS x, y
        |  FROM e),
        |m AS (
        |  SELECT user_id, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(CAST(x AS DECIMAL(18,0)) * y) AS sxy
        |  FROM c GROUP BY 1)
        |SELECT user_id, n,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
        |    ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * 86400, 6) END AS slope_per_day
        |FROM m""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
      val m = Tables.load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 1000000").as("sec"),
          col("value").cast("decimal(18,6)").as("y"))
        .withColumn("x", col("sec") - min(col("sec")).over(byUser))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(18,0)") * col("y")).as("sxy"))
      val n = col("n").cast("double")
      val den = (n * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double"))
      m.select(col("user_id"), col("n"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(round((n * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double")) / den
            * 86400d, 6))
          .as("slope_per_day"))
    },
  )
}
