package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Product/event analytics over the `events` stream table — the
  * query family a warehouse team runs on behavioral data: ordered
  * funnels, cohort retention, JSON property extraction, and per-group
  * regression. All four are oracled; determinism notes per query.
  *
  * Timestamp discipline: `events.ts` is parquet TIMESTAMP(NANOS);
  * Spark reads it truncated to µs (Tables.events), DuckDB keeps ns.
  * Every ORDERING/COMPARISON on ts therefore happens on epoch
  * MICROseconds on both sides (`unix_micros` ↔ `epoch_us`) — a
  * same-µs pair must not order differently across engines.
  */
object ProductAnalytics {

  val defs: Seq[QueryDef] = Seq(

    /* FU1: ordered funnel (view → click → purchase): per user, the
     * first view, the first click AFTER that view, the first purchase
     * AFTER that click — the "did they convert, in order" metric; one
     * summary row of stage counts.
     *
     * Shape at scale: ONE shuffle on user_id; the three stage marks are
     * window minima over the same partitioning (Spark chains the three
     * Window nodes without re-exchanging — each stage references the
     * previous stage's mark, which a per-user groupBy could not express
     * without three self-joins), then a global distinct-count over the
     * per-user flags. 100 TB of events funnel with the same plan.
     */
    QueryDef.sql("fu1_funnel",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS eus FROM events),
        |w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN eus END)
        |                   OVER (PARTITION BY user_id) AS tv FROM e),
        |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND eus > tv THEN eus END)
        |                   OVER (PARTITION BY user_id) AS tc FROM w1),
        |w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND eus > tc THEN eus END)
        |                   OVER (PARTITION BY user_id) AS tp FROM w2)
        |SELECT COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(DISTINCT CASE WHEN tv IS NOT NULL THEN user_id END) AS n_viewed,
        |       COUNT(DISTINCT CASE WHEN tc IS NOT NULL THEN user_id END) AS n_clicked_after,
        |       COUNT(DISTINCT CASE WHEN tp IS NOT NULL THEN user_id END) AS n_purchased_after
        |FROM w3""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("eus"))
        .withColumn("tv", min(when(col("event_type") === "view", col("eus"))).over(w))
        .withColumn("tc", min(when(col("event_type") === "click" &&
          col("eus") > col("tv"), col("eus"))).over(w))
        .withColumn("tp", min(when(col("event_type") === "purchase" &&
          col("eus") > col("tc"), col("eus"))).over(w))
        .agg(
          count_distinct(col("user_id")).as("n_users"),
          count_distinct(when(col("tv").isNotNull, col("user_id"))).as("n_viewed"),
          count_distinct(when(col("tc").isNotNull, col("user_id"))).as("n_clicked_after"),
          count_distinct(when(col("tp").isNotNull, col("user_id"))).as("n_purchased_after"))
    },

    /* CO1: cohort retention — users cohorted by their first active DAY;
     * for each cohort and day-offset k (0..7), how many distinct users
     * were active again k days later. The day grid is data-derived
     * (distinct user-days), never a generated cross product.
     *
     * Shape at scale: per-user first-day agg (one shuffle, map-side
     * combine), distinct user-days (second shuffle, combine), a join
     * back on user_id, and a final small agg keyed (cohort_day, k).
     */
    QueryDef.sql("co1_cohort_retention",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id)
        |SELECT c.cohort_day, date_diff('day', c.cohort_day, ud.day) AS k,
        |       COUNT(DISTINCT ud.user_id) AS n_active
        |FROM ud JOIN c ON ud.user_id = c.user_id
        |WHERE date_diff('day', c.cohort_day, ud.day) <= 7
        |GROUP BY c.cohort_day, k
        |ORDER BY c.cohort_day, k""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      // cohort day as a user-partitioned MIN window instead of a
      // groupBy + self-join (r17: one user_id exchange replaces an
      // aggregation exchange plus a join); and since ud is distinct on
      // (user_id, day) and k is a function of day, a user contributes
      // at most one row per (cohort_day, k) — the distinct count is a
      // plain count
      ud.withColumn("cohort_day",
          min("day").over(Window.partitionBy("user_id")))
        .withColumn("k", datediff(col("day"), col("cohort_day")))
        .filter(col("k") <= 7)
        .groupBy("cohort_day", "k")
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_day", "k")
    },

    /* F16: JSON property extraction — the semi-structured half of the
     * events table (`props` is a JSON string). Path extraction with a
     * typed cast, a missing path (must be NULL, not an error), a nested
     * array path on a literal probe, and array length — the
     * get_json_object ↔ json_extract_string common subset. Map-only.
     */
    QueryDef.sql("f16_json_funcs",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |       json_extract_string(props, '$.nope') AS missing_path,
        |       json_extract_string('{"a": {"b": [10, 20, 30]}}', '$.a.b[1]') AS nested_probe,
        |       CAST(json_array_length('[1, 2, 3, 4]') AS BIGINT) AS arr_len
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        get_json_object(col("props"), "$.nope").as("missing_path"),
        get_json_object(lit("""{"a": {"b": [10, 20, 30]}}"""), "$.a.b[1]")
          .as("nested_probe"),
        expr("json_array_length('[1, 2, 3, 4]')").cast("long").as("arr_len"))
        .orderBy("event_id")
    },

    /* A14: per-group OLS regression — slope/intercept of event value
     * against hour-of-day per event_type (the "does the metric drift
     * through the day" fit). Exact integer power sums per group (value
     * quantized to cents, hour is an int), then slope and intercept are
     * derived with the SAME single-IEEE-op expression sequence in both
     * engines — the a11/a13 determinism discipline, never the engines'
     * own regr_slope/regr_intercept accumulators.
     */
    QueryDef.sql("a14_group_regression",
      """WITH q AS (
        |  SELECT event_type,
        |         CAST(hour(ts) AS BIGINT) AS x,
        |         CAST(round(value * 100) AS BIGINT) AS yq
        |  FROM events),
        |sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * yq) AS BIGINT) AS sxy
        |  FROM q GROUP BY event_type)
        |SELECT event_type, n,
        |       CAST(n * sxy - sx * sy AS DOUBLE)
        |         / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope,
        |       (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
        |           / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         / CAST(n AS DOUBLE) / 100.0 AS intercept
        |FROM sums ORDER BY event_type""".stripMargin) { (s, d) =>
      val q = Tables.events(s, d).select(
        col("event_type"),
        hour(col("ts")).cast("long").as("x"),
        round(col("value") * 100, 0).cast("long").as("yq"))
      val sums = q.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("yq").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("yq")).as("sxy"))
      val slopeC = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      sums.select(col("event_type"), col("n"),
        (slopeC / 100.0).as("slope"),
        ((col("sy").cast("double") - slopeC * col("sx").cast("double"))
          / col("n").cast("double") / 100.0).as("intercept"))
        .orderBy("event_type")
    },

    /* CO2: DAU / WAU / stickiness — the engagement triple. WAU(d) =
     * distinct users active in [d-6, d] is computed by CONTRIBUTION
     * EXPLODE: each distinct (user, day) activity contributes to the 7
     * windows ending on day..day+6, then one distinct-count per
     * contributed day — a bounded ×7 row expansion with map-side
     * combine, instead of the per-day self-join (7 scans) or a
     * RANGE-frame distinct window (which no engine supports exactly).
     * Output keeps only days with actual activity. Stickiness is the
     * one IEEE division.
     */
    QueryDef.sql("co2_dau_wau",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS n_dau FROM ud GROUP BY day),
        |contrib AS (
        |  SELECT ud.user_id, ud.day + CAST(i AS INTEGER) AS wday
        |  FROM ud, unnest(generate_series(0, 6)) AS t(i)),
        |wau AS (
        |  SELECT wday AS day, COUNT(DISTINCT user_id) AS n_wau
        |  FROM contrib GROUP BY wday)
        |SELECT d.day, dau.n_dau, wau.n_wau,
        |       CAST(dau.n_dau AS DOUBLE) / CAST(wau.n_wau AS DOUBLE) AS stickiness
        |FROM days d JOIN dau ON d.day = dau.day JOIN wau ON d.day = wau.day
        |ORDER BY d.day""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      // ud is distinct on (user_id, day), so per-day user_ids are
      // already unique: DAU is a plain count (no two-phase distinct
      // aggregation), and dau's key set IS the active-day set, so the
      // separate days-distinct + identity join is dropped (r17: three
      // aggregations + two joins over ud -> two aggregations + one
      // join; wau keeps its true distinct count — a user active twice
      // inside one trailing window must still count once)
      val dau = ud.groupBy("day").agg(count(lit(1)).as("n_dau"))
      val wau = ud
        .withColumn("i", explode(sequence(lit(0), lit(6))))
        .select(col("user_id"), expr("date_add(day, i)").as("day"))
        .groupBy("day").agg(count_distinct(col("user_id")).as("n_wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("n_dau"), col("n_wau"),
          (col("n_dau").cast("double") / col("n_wau").cast("double")).as("stickiness"))
        .orderBy("day")
    },

    /* A15: per-group mode — the most frequent (rounded) value per
     * event_type with its frequency, ties to the LOWEST value so the
     * answer is deterministic in any engine (the built-in mode()'s tie
     * choice is unspecified in both Spark and DuckDB, so neither is
     * used). Shape: one (group, value) count with map-side combine,
     * then a per-group top-1 window over the already-aggregated counts
     * — the window input is |group|·|distinct values| rows, not the
     * corpus.
     */
    QueryDef.sql("a15_mode",
      """WITH vc AS (
        |  SELECT event_type, CAST(round(value) AS BIGINT) AS v, COUNT(*) AS n
        |  FROM events GROUP BY event_type, v)
        |SELECT event_type, v AS modal_value, n AS n_occurrences
        |FROM (SELECT event_type, v, n,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY n DESC, v) AS rn
        |      FROM vc)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), round(col("value"), 0).cast("long").as("v"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(desc("n"), asc("v"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("v").as("modal_value"),
          col("n").as("n_occurrences"))
        .orderBy("event_type")
    },

    /* FU2: behavioral transition matrix — the first-order Markov view
     * of the event stream (what follows what, per user journey), the
     * statistic behind next-action prediction, anomaly detection on
     * flows, and funnel DISCOVERY (fu1 checks a known path; fu2 finds
     * the paths). P(to|from) in integer ppm, exact in DECIMAL(38,0)/
     * HUGEINT per the s5 overflow lesson.
     *
     * Determinism: successor order is (epoch µs, event_id) — a
     * same-µs pair cannot order differently across engines (module
     * scaladoc). Shape at scale: ONE shuffle on user_id for the lead()
     * window; the pair rollup is a map-side-combined groupBy onto a
     * |event_types|²-bounded frame, and the row-conditional rollup is
     * a window over THAT bounded frame. 100 TB of events, same plan.
     */
    QueryDef.sql("fu2_transition_matrix",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS eus, event_id FROM events),
        |seq AS (SELECT event_type AS from_event,
        |               lead(event_type) OVER (PARTITION BY user_id
        |                                      ORDER BY eus, event_id) AS to_event
        |        FROM e),
        |pairs AS (SELECT from_event, to_event, COUNT(*) AS n
        |          FROM seq WHERE to_event IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_event, to_event, n,
        |               CAST(SUM(n) OVER (PARTITION BY from_event) AS BIGINT) AS n_from
        |        FROM pairs)
        |SELECT from_event, to_event, n, n_from,
        |       CAST((1000000 * CAST(n AS HUGEINT)) // n_from AS BIGINT) AS prob_ppm
        |FROM tot ORDER BY from_event, to_event""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("eus"), col("event_id"))
        .select(col("event_type").as("from_event"),
          lead(col("event_type"), 1).over(
            Window.partitionBy("user_id").orderBy(col("eus"), col("event_id")))
            .as("to_event"))
        .filter(col("to_event").isNotNull)
        .groupBy("from_event", "to_event").agg(count(lit(1)).as("n"))
        .withColumn("n_from",
          sum("n").over(Window.partitionBy("from_event")).cast("long"))
        .withColumn("prob_ppm",
          expr("CAST((1000000 * CAST(n AS DECIMAL(38,0))) div n_from AS BIGINT)"))
        .select("from_event", "to_event", "n", "n_from", "prob_ppm")
        .orderBy("from_event", "to_event")
    },

    /* FU3: top behavioral paths — frequent 3-step event sequences per
     * user journey (the sequence-mining report product teams read next
     * to fu2's one-step matrix; a path that outranks its Markov
     * expectation is a real flow, not chance). Two lead()s over the
     * SAME (user_id | eus, event_id) window — one shuffle, no
     * re-exchange between the leads — then a map-side-combined rollup
     * onto the ≤|event_types|³-bounded path frame and a top-10
     * TakeOrdered. Share in exact ppm (HUGEINT/DECIMAL discipline).
     */
    QueryDef.sql("fu3_top_paths",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS eus, event_id FROM events),
        |seq AS (SELECT event_type AS e1,
        |               lead(event_type, 1) OVER w AS e2,
        |               lead(event_type, 2) OVER w AS e3
        |        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)),
        |paths AS (SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
        |          FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM paths)
        |SELECT path, n,
        |       CAST((1000000 * CAST(n AS HUGEINT)) // n_total AS BIGINT) AS share_ppm
        |FROM paths CROSS JOIN tot
        |ORDER BY n DESC, path LIMIT 10""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("eus"), col("event_id"))
      val paths = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("eus"), col("event_id"))
        .select(col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
      val tot = paths.agg(sum("n").cast("long").as("n_total"))
      paths.crossJoin(broadcast(tot))
        .withColumn("share_ppm",
          expr("CAST((1000000 * CAST(n AS DECIMAL(38,0))) div n_total AS BIGINT)"))
        .select("path", "n", "share_ppm")
        .orderBy(col("n").desc, col("path").asc)
        .limit(10)
    }
  )
}
