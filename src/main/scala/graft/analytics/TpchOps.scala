package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Join / window / grouping-set / set-op / pivot surface over the
  * TPC-H-ish star schema (SURVEY.md §2.8-2.9 names these as the
  * extension surface; the reference itself has zero joins).
  *
  * Scale design notes (100 TB):
  *  - region/nation are constant-size at any SF → explicit `broadcast`.
  *  - customer/orders/lineitem scale with SF → no forced broadcast;
  *    Catalyst + AQE pick shuffle-hash/sort-merge and handle skew.
  *  - Big-big joins shuffle on the join key once; aggregations that
  *    follow reuse that partitioning where possible (group on the key).
  *  - Money sums go through DECIMAL(28,10): exact, order-independent —
  *    the same answer on 32 local threads or 1000 executors.
  */
object TpchOps {

  /** Exact, order-independent money sum as a cross-engine-identical
    * double: Σ as DECIMAL(28,10) (exact), round to cents on the exact
    * decimal, go through BIGINT (exact in double), then one IEEE
    * division. A direct DECIMAL→DOUBLE cast is NOT portable — DuckDB's
    * conversion can be 1 ulp off Spark's correctly-rounded one.
    */
  private def dsum(c: org.apache.spark.sql.Column) = graft.Exact.moneySum(c)

  val defs: Seq[QueryDef] = Seq(

    // J1: big-big-medium 3-way equi join + grouped revenue.
    QueryDef.sql("j1_revenue_by_segment",
      s"""SELECT c_mktsegment,
        |       ${graft.Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment")
    },

    // J2: star join with constant-size dims — explicit broadcast.
    QueryDef.sql("j2_asia_nation_revenue",
      s"""SELECT n_name,
        |       ${graft.Exact.moneySumSql("o_totalprice")} AS total_order_value,
        |       COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(
          dsum(col("o_totalprice")).as("total_order_value"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    },

    // J3: left-semi (EXISTS) — customers that ordered, by segment.
    QueryDef.sql("j3_semi_customers_with_orders",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },

    // J4: left-anti (NOT EXISTS) — parts never shipped, by brand.
    QueryDef.sql("j4_anti_parts_never_shipped",
      """SELECT p_brand, COUNT(*) AS n_parts
        |FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      val p = Tables.part(s, d)
      val li = Tables.lineitem(s, d)
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    },

    // J5: left-outer + two-level aggregation (order-size distribution,
    // zero-lineitem orders included).
    QueryDef.sql("j5_outer_order_size_dist",
      """SELECT cnt_items, COUNT(*) AS n_orders
        |FROM (SELECT o_orderkey, COUNT(l_orderkey) AS cnt_items
        |      FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |      GROUP BY o_orderkey)
        |GROUP BY cnt_items ORDER BY cnt_items""".stripMargin) { (s, d) =>
      // Pre-aggregate lineitem to per-order counts BEFORE the join
      // (map-side combine shrinks the join's right side from every line
      // item to one row per order); unmatched orders coalesce to 0 —
      // identical to COUNT(l_orderkey) over the raw left join, without
      // shuffling the full join output through a second aggregate.
      val cnt = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      Tables.orders(s, d).select("o_orderkey")
        .join(cnt, col("o_orderkey") === col("l_orderkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("cnt_items"))
        .groupBy("cnt_items").agg(count(lit(1)).as("n_orders"))
        .orderBy("cnt_items")
    },

    // G2: TPC-H Q1-style pricing summary with a pushed-down date filter.
    QueryDef.sql("g2_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
        |       ${graft.Exact.moneySumSql("l_quantity")} AS sum_qty,
        |       ${graft.Exact.moneySumSql("l_extendedprice")} AS sum_base_price,
        |       ${graft.Exact.moneySumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        |       ${graft.Exact.moneySumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        |       ${graft.Exact.moneySumSql("l_quantity")} / COUNT(*) AS avg_qty,
        |       ${graft.Exact.moneySumSql("l_discount")} / COUNT(*) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-12-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"),
          dsum(col("l_discount")).as("sum_disc"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("sum_charge"),
          (col("sum_qty") / col("count_order")).as("avg_qty"),
          (col("sum_disc") / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // G1: ROLLUP grouping sets with grouping() disambiguators.
    QueryDef.sql("g1_rollup",
      s"""SELECT l_returnflag, l_linestatus,
        |       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
        |       COUNT(*) AS n,
        |       ${graft.Exact.moneySumSql("l_quantity")} AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            grouping(col("l_returnflag")).as("g_flag"),
            grouping(col("l_linestatus")).as("g_status"),
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"))
          .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty")
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // W1: ranking — top-3 line items per supplier by price (windowed
    // row_number with a total-order tiebreak).
    QueryDef.sql("w1_topk_per_supplier",
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |             row_number() OVER (PARTITION BY l_suppkey
        |                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_suppkey", "rn")
    },

    // W2: lag + delta per supplier over ship time.
    // NOTE: (l_orderkey, l_linenumber) is NOT unique in this synthetic
    // data, so the window order carries every remaining column and the
    // computed delta is the final output tiebreak — the value multiset
    // at fully-tied positions is deterministic even when row identity
    // is not.
    QueryDef.sql("w2_lag_delta",
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice,
        |       l_extendedprice - lag(l_extendedprice) OVER w AS price_delta
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |                      l_quantity, l_extendedprice, l_discount)
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |         l_extendedprice, price_delta ASC NULLS FIRST""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey",
            "l_quantity", "l_extendedprice", "l_discount")
        Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"),
            (col("l_extendedprice") - lag("l_extendedprice", 1).over(w)).as("price_delta"))
          .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"),
            asc_nulls_first("price_delta"))
    },

    // W3: running (cumulative) quantity per supplier — frame
    // UNBOUNDED PRECEDING..CURRENT ROW; integral doubles stay exact.
    QueryDef.sql("w3_running_sum",
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |       SUM(l_quantity) OVER (PARTITION BY l_suppkey
        |                             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |                                      l_quantity, l_extendedprice, l_discount
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, running_qty""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey",
            "l_quantity", "l_extendedprice", "l_discount")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"), sum("l_quantity").over(w).as("running_qty"))
          .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
            "running_qty")
    },

    // SET1: UNION / INTERSECT / EXCEPT (all distinct) over nation keys.
    QueryDef.sql("set1_nation_ops",
      """SELECT
        |  (SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier)) AS n_union,
        |  (SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)) AS n_intersect,
        |  (SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)) AS n_except""".stripMargin) {
      (s, d) =>
        // One LAZY plan (drivers assume queries build without executing):
        // three 1-row aggregates cross-joined.
        val c = Tables.customer(s, d).select(col("c_nationkey").as("k"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
        val u = c.union(sup).distinct() // Dataset.union is UNION ALL
          .agg(count(lit(1)).as("n_union"))
        val i = c.intersect(sup) // distinct, like SQL INTERSECT
          .agg(count(lit(1)).as("n_intersect"))
        val e = c.except(sup) // distinct, like SQL EXCEPT
          .agg(count(lit(1)).as("n_except"))
        u.crossJoin(i).crossJoin(e)
    },

    // PV1: pivot — daily counts per event type as columns.
    QueryDef.sql("pv1_daily_pivot",
      """SELECT CAST(ts AS DATE) AS day,
        |       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .withColumn("day", col("ts").cast("date"))
        .groupBy("day")
        .pivot("event_type", types)
        .count()
      types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy("day")
    }
  )
}
