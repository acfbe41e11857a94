package graft.analytics

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Scalar-function breadth (SURVEY.md §2.4 beyond the enrichment set)
  * plus CUBE grouping sets: string ops over `part`, date/time ops over
  * `orders` — each expression chosen so the Spark and DuckDB spellings
  * are value-identical (noted inline where the dialects differ).
  */
object FuncOps {

  val defs: Seq[QueryDef] = Seq(

    // G3: CUBE — all grouping-set combinations (rollup's sibling).
    QueryDef.sql("g3_cube",
      s"""SELECT l_returnflag, l_linestatus,
        |       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
        |       COUNT(*) AS n,
        |       ${graft.Exact.moneySumSql("l_quantity")} AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(
            grouping(col("l_returnflag")).as("g_flag"),
            grouping(col("l_linestatus")).as("g_status"),
            count(lit(1)).as("n"),
            graft.Exact.moneySum(col("l_quantity")).as("sum_qty"))
          .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty")
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // T5: string function battery over part.
    QueryDef.sql("t5_string_funcs",
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_u,
        |       lower(p_type) AS type_l,
        |       length(p_name) AS name_len,
        |       substr(p_name, 1, 12) AS name_prefix,
        |       replace(p_type, ' ', '_') AS type_snake,
        |       reverse(p_brand) AS brand_rev,
        |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |       strpos(p_type, 'ED') AS ed_pos,
        |       concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 12).as("name_prefix"),
          regexp_replace(col("p_type"), " ", "_").as("type_snake"),
          reverse(col("p_brand")).as("brand_rev"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          // Spark instr == DuckDB strpos: 1-based, 0 when absent
          instr(col("p_type"), "ED").cast("long").as("ed_pos"),
          concat(col("p_brand"), lit(":"), col("p_size").cast("string")).as("brand_size"))
        .orderBy("p_partkey")
    },

    // F10: date/time function battery over orders.
    QueryDef.sql("f10_date_funcs",
      """SELECT o_orderkey,
        |       year(o_orderdate) AS y,
        |       month(o_orderdate) AS m,
        |       day(o_orderdate) AS dom,
        |       quarter(o_orderdate) AS q,
        |       isodow(o_orderdate) AS dow_iso,
        |       date_trunc('month', o_orderdate) AS month_start,
        |       CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |       o_orderdate + INTERVAL 30 DAY AS plus_30d,
        |       CAST(date_diff('day', o_orderdate, TIMESTAMP '1999-01-01 00:00:00') AS INT) AS days_to_1999
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          // Spark weekday: 0=Mon..6=Sun; DuckDB isodow: 1=Mon..7=Sun
          (weekday(col("o_orderdate")) + 1).as("dow_iso"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate")).as("month_end"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus_30d"),
          datediff(lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")),
            col("o_orderdate")).as("days_to_1999"))
        .orderBy("o_orderkey")
    }
  )
}
