package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** The reference dashboard's batch-analytics surface (SURVEY.md §2.6
  * aggregations A1-A10, §2.7 sorts/limits O1-O4, §2.3 filters P6-P9,
  * §2.2 projection ops P4-P5, §2.4 P10), re-expressed as lazy Spark
  * plans — Catalyst gives partial+final hash aggregation, pushdown and
  * TakeOrderedAndProject for free, replacing the reference's eager
  * single-threaded pandas path.
  *
  * Cross-engine determinism strategy (so every query is DuckDB-hash-
  * comparable): aggregates over integers use exact long sums; aggregates
  * over doubles go through DECIMAL(28,10) sums (exact, order-independent)
  * and derive avg/stddev from those sums with plain IEEE arithmetic —
  * identical bit-for-bit in both engines. stddev is the sample form
  * (ddof=1), matching pandas `std`.
  */
object Dashboard {

  private def enr(s: SparkSession, d: String): DataFrame =
    EventWeather.enriched(s, d)

  private val cte = EventWeather.weatherCte

  /** Deterministic sample-stddev from exact sums: all inputs must be
    * bit-identical across engines; every op here is a single IEEE-double
    * op, so the result is too.
    */
  private def stddevFromSums(s: Column, sq: Column, n: Column): Column =
    sqrt((sq - s * s / n) / (n - lit(1)))

  val defs: Seq[QueryDef] = Seq(

    // A1: COUNT(*)
    QueryDef.sql("a1_count",
      "SELECT COUNT(*) AS n_rows FROM events") { (s, d) =>
      Tables.events(s, d).agg(count(lit(1)).as("n_rows"))
    },

    // A2: COUNT(DISTINCT) — exact; the approx variant is benched in
    // scale_approx_distinct (not oracled: HLL estimates are engine-specific).
    QueryDef.sql("a2_count_distinct",
      """SELECT COUNT(DISTINCT event_type) AS n_types,
        |       COUNT(DISTINCT user_id) AS n_users FROM events""".stripMargin) {
      (s, d) =>
        Tables.events(s, d).agg(
          countDistinct(col("event_type")).as("n_types"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // A3: grouped multi-agg (mean/min/max/std of temperature per series
    // key, round 2 — pandas ddof=1 stddev), derived from exact long sums.
    QueryDef.sql("a3_grouped_stats",
      cte +
        """SELECT city_name,
          |       COUNT(*) AS n,
          |       round(CAST(CAST(SUM(temperature) AS BIGINT) AS DOUBLE) / COUNT(*), 2) AS avg_temp,
          |       MIN(temperature) AS min_temp,
          |       MAX(temperature) AS max_temp,
          |       round(sqrt((CAST(CAST(SUM(temperature*temperature) AS BIGINT) AS DOUBLE)
          |                   - CAST(CAST(SUM(temperature) AS BIGINT) AS DOUBLE)
          |                     * CAST(CAST(SUM(temperature) AS BIGINT) AS DOUBLE) / COUNT(*))
          |                  / (COUNT(*) - 1)), 2) AS std_temp
          |FROM e GROUP BY city_name ORDER BY city_name""".stripMargin) { (s, d) =>
      enr(s, d).groupBy("city_name")
        .agg(
          count(lit(1)).as("n"),
          sum(col("temperature")).cast("double").as("s"),
          sum(col("temperature") * col("temperature")).cast("double").as("sq"),
          min(col("temperature")).as("min_temp"),
          max(col("temperature")).as("max_temp"))
        .select(
          col("city_name"), col("n"),
          round(col("s") / col("n"), 2).as("avg_temp"),
          col("min_temp"), col("max_temp"),
          round(stddevFromSums(col("s"), col("sq"), col("n")), 2).as("std_temp"))
        .orderBy("city_name")
    },

    // A4 + A10 + O4: value_counts desc (top-k) with share-of-total.
    QueryDef.sql("a4_value_counts",
      cte +
        """SELECT alert_type, COUNT(*) AS cnt,
          |       CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
          |FROM e GROUP BY alert_type ORDER BY cnt DESC, alert_type""".stripMargin) {
      (s, d) =>
        val g = enr(s, d).groupBy("alert_type").agg(count(lit(1)).as("cnt"))
        g.withColumn("share",
            col("cnt").cast("double") /
              sum(col("cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
          .orderBy(desc("cnt"), asc("alert_type"))
    },

    // A5 + A6: global scalar stats — ints exactly, doubles via decimal sums.
    QueryDef.sql("a5_global_stats",
      cte +
        """SELECT COUNT(*) AS n,
          |       round(CAST(CAST(SUM(temperature) AS BIGINT) AS DOUBLE) / COUNT(*), 2) AS avg_temp,
          |       MIN(temperature) AS min_temp,
          |       MAX(temperature) AS max_temp,
          |       round(sqrt((CAST(CAST(SUM(temperature*temperature) AS BIGINT) AS DOUBLE)
          |                   - CAST(CAST(SUM(temperature) AS BIGINT) AS DOUBLE)
          |                     * CAST(CAST(SUM(temperature) AS BIGINT) AS DOUBLE) / COUNT(*))
          |                  / (COUNT(*) - 1)), 2) AS std_temp,
          |       MIN(wind_speed_num) AS min_wind,
          |       MAX(wind_speed_num) AS max_wind,
          |       round(CAST(ROUND(SUM(CAST(wind_speed_num AS DECIMAL(28,10))) * 1000000, 0) AS BIGINT) / 1000000.0 / COUNT(*), 2) AS avg_wind
          |FROM e""".stripMargin) { (s, d) =>
      enr(s, d).agg(
          count(lit(1)).as("n"),
          sum(col("temperature")).cast("double").as("s"),
          sum(col("temperature") * col("temperature")).cast("double").as("sq"),
          min(col("temperature")).as("min_temp"),
          max(col("temperature")).as("max_temp"),
          min(col("wind_speed_num")).as("min_wind"),
          max(col("wind_speed_num")).as("max_wind"),
          (round(sum(col("wind_speed_num").cast("decimal(28,10)")) * 1000000, 0).cast("long") / lit(1000000.0)).as("sw"))
        .select(
          col("n"),
          round(col("s") / col("n"), 2).as("avg_temp"),
          col("min_temp"), col("max_temp"),
          round(stddevFromSums(col("s"), col("sq"), col("n")), 2).as("std_temp"),
          col("min_wind"), col("max_wind"),
          round(col("sw") / col("n"), 2).as("avg_wind"))
    },

    // A7: 30-bin equi-width histogram. Bounds are a 1-row broadcast —
    // the scan+bin pass stays narrow at any scale.
    QueryDef.sql("a7_histogram",
      cte +
        """, b AS (SELECT MIN(temperature) AS lo, MAX(temperature) AS hi FROM e)
          |SELECT CAST(LEAST(floor((CAST(temperature AS DOUBLE) - CAST(lo AS DOUBLE))
          |                        / ((CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) / 30.0)),
          |                  CAST(29 AS DOUBLE)) AS INT) AS bin,
          |       COUNT(*) AS cnt
          |FROM e, b GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
      val e = enr(s, d)
      val b = e.agg(min("temperature").as("lo"), max("temperature").as("hi"))
      e.crossJoin(broadcast(b))
        .select(
          least(
            floor((col("temperature").cast("double") - col("lo").cast("double")) /
              ((col("hi").cast("double") - col("lo").cast("double")) / 30.0)),
            lit(29.0)).cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
        .orderBy("bin")
    },

    // A8: exact quartiles per group (box-plot stats). Int inputs make
    // linear interpolation exact in IEEE doubles on both engines.
    QueryDef.sql("a8_quantiles",
      cte +
        """SELECT city_name,
          |       quantile_cont(temperature, 0.25) AS q1,
          |       quantile_cont(temperature, 0.50) AS median,
          |       quantile_cont(temperature, 0.75) AS q3
          |FROM e GROUP BY city_name ORDER BY city_name""".stripMargin) { (s, d) =>
      enr(s, d).groupBy("city_name")
        .agg(
          percentile(col("temperature"), lit(0.25)).as("q1"),
          percentile(col("temperature"), lit(0.50)).as("median"),
          percentile(col("temperature"), lit(0.75)).as("q3"))
        .orderBy("city_name")
    },

    // A9: DISTINCT pick-list values.
    QueryDef.sql("a9_distinct",
      "SELECT DISTINCT event_type FROM events ORDER BY event_type") { (s, d) =>
      Tables.events(s, d).select("event_type").distinct().orderBy("event_type")
    },

    // O2 + O3: newest-first preview (sort desc + limit) —
    // TakeOrderedAndProject, no global sort at scale.
    QueryDef.sql("o2_latest",
      cte +
        """SELECT event_id, timestamp_dt, city_name, temperature, alert_type
          |FROM e ORDER BY timestamp_dt DESC, event_id LIMIT 100""".stripMargin) {
      (s, d) =>
        enr(s, d)
          .select("event_id", "timestamp_dt", "city_name", "temperature", "alert_type")
          .orderBy(desc("timestamp_dt"), asc("event_id"))
          .limit(100)
    },

    // P6-P9: predicate stack — BETWEEN + IN-list + IS NOT NULL + LIKE.
    QueryDef.sql("p6p9_filter_combo",
      cte +
        """SELECT event_id, city_name, temperature, wind_speed_num, weather_description
          |FROM e
          |WHERE temperature BETWEEN 18 AND 30
          |  AND city_name IN ('click', 'view', 'purchase')
          |  AND wind_speed_num IS NOT NULL
          |  AND weather_description LIKE '%a%'
          |ORDER BY event_id""".stripMargin) { (s, d) =>
      enr(s, d)
        .filter(col("temperature").between(18, 30) &&
          col("city_name").isin("click", "view", "purchase") &&
          col("wind_speed_num").isNotNull &&
          col("weather_description").like("%a%"))
        .select("event_id", "city_name", "temperature", "wind_speed_num",
          "weather_description")
        .orderBy("event_id")
    },

    // P10: timestamp unit-sniffing (ms vs s vs string-parse fallback).
    // Even ids carry epoch-ms, odd ids epoch-s (which, being < 1e10,
    // falls through to the string-parse branch and nulls out — exactly
    // the reference heuristic's behavior on second-resolution epochs).
    QueryDef.sql("p10_unit_sniff",
      """SELECT event_id,
        |       raw,
        |       CASE WHEN raw > 1000000000000 THEN make_timestamp(raw * 1000)
        |            WHEN raw > 10000000000 THEN make_timestamp(raw * 1000000)
        |            ELSE TRY_CAST(CAST(raw AS VARCHAR) AS TIMESTAMP) END AS sniffed_ts
        |FROM (SELECT event_id,
        |             CASE WHEN event_id % 2 = 0
        |                  THEN CAST(floor(epoch(ts)) AS BIGINT) * 1000
        |                  ELSE CAST(floor(epoch(ts)) AS BIGINT) END AS raw
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val raw = when(col("event_id") % 2 === 0, col("ts").cast("long") * 1000)
        .otherwise(col("ts").cast("long"))
      Tables.events(s, d)
        .select(col("event_id"), raw.as("raw"))
        .withColumn("sniffed_ts",
          when(col("raw") > 1000000000000L, timestamp_millis(col("raw")))
            .when(col("raw") > 10000000000L, timestamp_seconds(col("raw")))
            .otherwise(try_to_timestamp(col("raw").cast("string"))))
        .orderBy("event_id")
    },

    // P5: drop-all-null columns — data-dependent projection (two-pass).
    // Not one SQL query, but on a given dataset it resolves to a static
    // projection: the planted always-null column is dropped and every
    // real events column survives — which is exactly what the oracle
    // states, so the data-dependent logic is still oracle-checked.
    QueryDef.sql("p5_dropna_cols",
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin) { (s, d) =>
      val withNullCol = Tables.events(s, d)
        .withColumn("always_null", lit(null).cast("string"))
      dropAllNullColumns(withNullCol).orderBy("event_id").limit(100)
    }
  )

  /** P4/P5: pandas-style `dropna(axis=1, how='all')` — one aggregate
    * pass counting non-nulls per column, then a static projection.
    * Driver-side logic touches only the 1-row agg result.
    */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c => count(col(c)).as(c)).toSeq: _*)
      .first()
    val keep = df.columns.filter(c => counts.getAs[Long](c) > 0L)
    df.select(keep.map(col).toSeq: _*)
  }

  /** P4: defensive column normalization (alias temp→temperature etc.). */
  def normalizeColumns(df: DataFrame, aliases: Map[String, String]): DataFrame =
    aliases.foldLeft(df) { case (acc, (from, to)) =>
      if (acc.columns.contains(from) && !acc.columns.contains(to))
        acc.withColumnRenamed(from, to)
      else acc
    }
}
