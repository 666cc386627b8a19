package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator coverage (SURVEY.md §2).
  *
  * Each entry re-expresses one reference operator Spark-first:
  *  - AGGREGATE (reference transforms/aggregate.go:33-54, reducers §2.6)
  *    → `groupBy().agg()` with Catalyst partial+final aggregation;
  *  - LOOKUP (reference transforms/lookup.go:109-263) → broadcast hash join
  *    (the reference caches the whole lookup side in memory, so broadcast is
  *    the faithful *and* scale-correct physical strategy);
  *  - delegated-SQL surface (reference engine/sql_source.go:170,
  *    auto_sql_transform.go:226) → `spark.sql` over temp views;
  *  - set ops / windows / sort-limit: reachable only via delegated SQL in the
  *    reference (§2.7) — first-class DataFrame ops here.
  *
  * Money math rides DECIMAL(18,2) (see [[graft.Tables.dec2]]) so results are
  * bit-reproducible across partitionings and engines.
  */
object Relational {
  import Tables.{dec2, dsum}

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val entries: Seq[QueryDef] = Seq(

    // ---- AGGREGATE: SUM/AVG/COUNT over groups (TPC-H Q1 shape) ----
    QueryDef(
      "q01_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // ---- AGGREGATE: MIN/MAX/COUNT/COUNT DISTINCT reducers ----
    QueryDef(
      "q02_agg_minmax_distinct",
      """SELECT l_returnflag,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        |  COUNT(*) AS n_rows, COUNT(DISTINCT l_partkey) AS n_parts,
        |  MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_parts"),
          min(col("l_shipdate")).as("first_ship"),
          max(col("l_shipdate")).as("last_ship"))
    },

    // ---- LOOKUP ... INNER JOIN (reference transforms/lookup.go): broadcast
    // hash equi-join, build side = small dimension, then aggregate. ----
    QueryDef(
      "q05_lookup_inner",
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("total_price"))
    },

    // ---- LOOKUP ... OUTER JOIN (left outer; reference lookup.go:234-236
    // emits base row with NULL lookup cols on miss). ----
    QueryDef(
      "q06_lookup_outer",
      """SELECT n_name,
        |  COUNT(c_custkey) AS n_customers,
        |  CAST(SUM(CAST(COALESCE(c_acctbal, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      n.join(c, c("c_nationkey") === n("n_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"),
             sum(dec2(coalesce(col("c_acctbal"), lit(0)))).cast("double").as("total_bal"))
    },

    // ---- Multi-way star join with broadcast dims + pushed filters
    // (TPC-H Q5 shape; delegated-SQL surface in the reference). ----
    QueryDef(
      "q07_star_join",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation");   val r = t(s, dir, "region")
      l.join(o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                      col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
             l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") &&
                 c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r.filter(col("r_name") === "ASIA")),
              n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
    },

    // ---- Semi join (reference: only via delegated WHERE EXISTS) ----
    QueryDef(
      "q08_semi_join",
      """SELECT c_nationkey, COUNT(*) AS n_big_spenders
        |FROM customer WHERE EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_big_spenders"))
    },

    // ---- Anti join (reference: only via delegated NOT EXISTS) ----
    QueryDef(
      "q09_anti_join",
      """SELECT c_nationkey, COUNT(*) AS n_inactive
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_inactive"))
    },

    // ---- Window: ranking (top-3 orders per customer, deterministic
    // tie-break on orderkey). Not native in the reference (§2.7). ----
    QueryDef(
      "q10_window_topk",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    },

    // ---- Window: running aggregate over event time (decimal-exact). ----
    QueryDef(
      "q11_window_running",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events WHERE event_type = 'purchase'""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
                sum(dec2(col("value"))).over(w).cast("double").as("running_value"))
    },

    // ---- Sort + limit (top-k; reference only via delegated `TOP n`). ----
    QueryDef(
      "q12_sort_limit",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // ---- Set ops: UNION (distinct), INTERSECT, EXCEPT (§2.7). ----
    QueryDef(
      "q13_union",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    },

    QueryDef(
      "q14_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    },

    QueryDef(
      "q15_except",
      """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT
        |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
      l.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
        .except(l.filter(col("l_returnflag") === "A").select(col("l_orderkey")))
    },

    // ---- APPLY / CAST projection (reference transforms/apply.go:81-132,
    // cast.go:13-84: int⇄varchar⇄datetime-epoch-seconds). ----
    QueryDef(
      "q16_apply_cast",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_orderkey AS VARCHAR) AS key_str,
        |  CAST(l_quantity AS BIGINT) AS qty_int,
        |  CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
        |  upper(l_returnflag) AS flag_u
        |FROM lineitem WHERE l_orderkey < 1000""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").cast("string").as("key_str"),
          // quantities are integral; decimal hop avoids trunc-vs-round
          // divergence between engines for the general double case
          col("l_quantity").cast("decimal(18,0)").cast("bigint").as("qty_int"),
          unix_timestamp(col("l_shipdate")).as("ship_epoch"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
          upper(col("l_returnflag")).as("flag_u"))
    },

    // ---- Filter + projection pushdown to parquet scan. ----
    QueryDef(
      "q17_filter_pushdown",
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00' AND l_quantity < 3""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp") &&
                col("l_quantity") < 3)
        .select(col("l_orderkey"), col("l_extendedprice"))
    },

    // ---- Delegated-SQL surface: subquery + HAVING via spark.sql over temp
    // views (replaces the reference's GLOBAL SQLite, compiler.go:20-21). ----
    QueryDef(
      "q18_sql_subquery_having",
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority
        |HAVING COUNT(*) > 10""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n
          |FROM orders
          |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
          |GROUP BY o_orderpriority
          |HAVING COUNT(*) > 10""".stripMargin)
    },

    // ---- Rollup (grouping sets; beyond-reference, free in Spark). ----
    QueryDef(
      "q19_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
    },
  )
}
