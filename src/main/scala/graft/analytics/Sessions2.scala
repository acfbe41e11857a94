package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Batch twins of the streaming stateful ops (COVERAGE: ST4/ST5): the
  * same session/window semantics expressed relationally, so they get a
  * full DuckDB oracle (the streaming forms are pinned by StreamingSpec).
  *
  * Determinism notes: gap comparisons use integer MICROSECONDS
  * (`unix_micros` ≡ `epoch_us` — fractional-second doubles divide
  * differently across engines), and every window order carries the
  * unique event_id tiebreak.
  */
object BatchSessionOps {

  private val GapUs = 1800L * 1000000L // 30 min, matches Sessionize.GapMs

  val defs: Seq[QueryDef] = Seq(

    // SESS1: gap-based sessionization via lag + cumulative sum — one
    // shuffle on user_id; the 100 TB shape of sessionizing a log.
    QueryDef.sql("sess1_batch_sessions",
      s"""WITH marked AS (
         |  SELECT user_id, ts,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $GapUs
         |              THEN 1 ELSE 0 END AS new_session,
         |         event_id
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         |  SELECT user_id, ts,
         |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM marked)
         |SELECT user_id, session_idx, MIN(ts) AS session_start, MAX(ts) AS session_end,
         |       COUNT(*) AS n_events
         |FROM numbered GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wSum = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > GapUs, 1)
            .otherwise(0))
        .withColumn("session_idx", sum("new_session").over(wSum))
        .groupBy("user_id", "session_idx")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_idx")
    },

    // WIN1: tumbling 6-hour windows, batch form of windowedStats (ST4).
    // Spark's window() aligns to the epoch, so the DuckDB mirror is
    // floor(epoch_us/window)*window.
    QueryDef.sql("win1_tumbling_batch",
      """SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS window_start,
        |       event_type,
        |       COUNT(*) AS n,
        |       CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 / COUNT(*) AS avg_value
        |FROM events
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100, 0).cast("long")).cast("double") / 100.0 /
            count(lit(1))).as("avg_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"),
          col("avg_value"))
        .orderBy("window_start", "event_type")
    },

    // TS1: calendar-spine gap fill + forward fill — the canonical
    // time-series regularization: a complete 6-hour grid per series
    // (generated spine × distinct keys, no data dependence beyond
    // min/max), missing buckets 0-counted, last-observation-carried-
    // forward for the value. One shuffle for the grid join, one
    // per-series window for the fill.
    QueryDef.sql("ts1_gap_fill",
      """WITH b AS (
        |  SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS bucket,
        |         event_type, value
        |  FROM events),
        |agg AS (
        |  SELECT bucket, event_type, COUNT(*) AS n_obs,
        |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_value
        |  FROM b GROUP BY bucket, event_type),
        |bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket FROM bounds),
        |grid AS (SELECT bucket, event_type FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM b)),
        |j AS (
        |  SELECT grid.bucket, grid.event_type,
        |         COALESCE(n_obs, 0) AS n_obs, a.avg_value
        |  FROM grid LEFT JOIN agg a ON grid.bucket = a.bucket AND grid.event_type = a.event_type)
        |SELECT bucket, event_type, n_obs,
        |       last_value(avg_value IGNORE NULLS)
        |         OVER (PARTITION BY event_type ORDER BY bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_filled
        |FROM j ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      gapFill(Tables.events(s, d))
    },

    // TS2: EWMA smoothing over the bucketed per-type value series —
    // the trend line ops dashboards draw over noisy counters (pandas
    // ewm adjust=True semantics, α = 0.5, 7-bucket horizon). The
    // cross-engine trick: α = 0.5 makes every weight a power of two,
    // and the series is integer cents, so every term s·2⁻ᵏ and both
    // running sums are EXACT multiples of 2⁻⁶ in IEEE doubles — no
    // rounding happens anywhere until the single final division. No
    // quantize-then-sum scaffolding needed; the arithmetic itself is
    // exact on both engines.
    // 100 TB shape: one map-side-combined bucket agg, then ONE window
    // (7 lags share it) over the bucket-bounded series frame — the
    // event corpus is touched once, the window never sees it.
    QueryDef.sql("ts2_ewma",
      """WITH b AS (
        |  SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS bucket,
        |         event_type, value
        |  FROM events),
        |agg AS (
        |  SELECT bucket, event_type,
        |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s_cents
        |  FROM b GROUP BY bucket, event_type),
        |lg AS (
        |  SELECT bucket, event_type, s_cents,
        |         lag(s_cents, 1) OVER w AS l1, lag(s_cents, 2) OVER w AS l2,
        |         lag(s_cents, 3) OVER w AS l3, lag(s_cents, 4) OVER w AS l4,
        |         lag(s_cents, 5) OVER w AS l5, lag(s_cents, 6) OVER w AS l6
        |  FROM agg WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
        |SELECT bucket, event_type, s_cents,
        |       round((s_cents + COALESCE(l1, 0) / CAST(2 AS DOUBLE) + COALESCE(l2, 0) / CAST(4 AS DOUBLE)
        |              + COALESCE(l3, 0) / CAST(8 AS DOUBLE) + COALESCE(l4, 0) / CAST(16 AS DOUBLE)
        |              + COALESCE(l5, 0) / CAST(32 AS DOUBLE) + COALESCE(l6, 0) / CAST(64 AS DOUBLE))
        |             / (1 + CASE WHEN l1 IS NULL THEN 0 ELSE CAST(0.5 AS DOUBLE) END
        |                  + CASE WHEN l2 IS NULL THEN 0 ELSE CAST(0.25 AS DOUBLE) END
        |                  + CASE WHEN l3 IS NULL THEN 0 ELSE CAST(0.125 AS DOUBLE) END
        |                  + CASE WHEN l4 IS NULL THEN 0 ELSE CAST(0.0625 AS DOUBLE) END
        |                  + CASE WHEN l5 IS NULL THEN 0 ELSE CAST(0.03125 AS DOUBLE) END
        |                  + CASE WHEN l6 IS NULL THEN 0 ELSE CAST(0.015625 AS DOUBLE) END), 4) AS ewma_cents
        |FROM lg ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      val agg = Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).cast("long").as("s_cents"))
        .select(col("w.start").as("bucket"), col("event_type"), col("s_cents"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
      val lg = (1 to 6).foldLeft(agg) { (df, k) =>
        df.withColumn(s"l$k", lag(col("s_cents"), k).over(w))
      }
      lg.withColumn("ewma_cents", expr(
          """round((s_cents + COALESCE(l1, 0) / CAST(2 AS DOUBLE) + COALESCE(l2, 0) / CAST(4 AS DOUBLE)
            |       + COALESCE(l3, 0) / CAST(8 AS DOUBLE) + COALESCE(l4, 0) / CAST(16 AS DOUBLE)
            |       + COALESCE(l5, 0) / CAST(32 AS DOUBLE) + COALESCE(l6, 0) / CAST(64 AS DOUBLE))
            |      / (1 + CASE WHEN l1 IS NULL THEN 0 ELSE CAST(0.5 AS DOUBLE) END
            |           + CASE WHEN l2 IS NULL THEN 0 ELSE CAST(0.25 AS DOUBLE) END
            |           + CASE WHEN l3 IS NULL THEN 0 ELSE CAST(0.125 AS DOUBLE) END
            |           + CASE WHEN l4 IS NULL THEN 0 ELSE CAST(0.0625 AS DOUBLE) END
            |           + CASE WHEN l5 IS NULL THEN 0 ELSE CAST(0.03125 AS DOUBLE) END
            |           + CASE WHEN l6 IS NULL THEN 0 ELSE CAST(0.015625 AS DOUBLE) END), 4)""".stripMargin))
        .select("bucket", "event_type", "s_cents", "ewma_cents")
        .orderBy("event_type", "bucket")
    }
  )

  /** TS1 core: regularize (ts, event_type, value) onto a complete
    * 6-hour grid with 0-counts and forward-filled averages. The sf data
    * happens to populate every bucket, so the actual fill path (missing
    * bucket → n_obs=0, avg carried forward, leading NULL before a
    * series' first observation) is pinned by OpsSpec on a gapped frame.
    */
  def gapFill(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // agg feeds three consumers (spine bounds, key list, grid join) —
    // checkpoint it so the scan+agg runs once, and derive the key list
    // from agg rather than a second pass over raw events (every
    // event_type in ev appears in agg by construction).
    val agg = ev
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_obs"),
        (sum(round(col("value") * 100, 0).cast("long")).cast("double") / 100.0 /
          count(lit(1))).as("avg_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n_obs"),
        col("avg_value"))
      .localCheckpoint()
    val spine = agg.agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 6 HOURS")))
        .as("bucket"))
    val grid = spine.crossJoin(agg.select("event_type").distinct())
    val wFill = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("bucket", "event_type"), "left")
      .select(col("bucket"), col("event_type"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("avg_value"))
      .withColumn("avg_filled", last(col("avg_value"), ignoreNulls = true).over(wFill))
      .drop("avg_value")
      .orderBy("event_type", "bucket")
  }
}
