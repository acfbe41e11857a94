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
