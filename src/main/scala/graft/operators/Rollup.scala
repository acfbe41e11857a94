package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Incremental materialized rollup — the view-maintenance shape every
  * 100 TB metrics pipeline runs: the accumulated history is NEVER
  * rescanned per refresh; instead a small MERGEABLE AGGREGATE STATE is
  * kept per (day, group) — count / quantized sum / quantized sum of
  * squares / min / max — and each new day folds in by pure state
  * algebra (Chan et al.'s parallel-variance decomposition: mean and
  * variance are exactly recoverable from (n, Σx, Σx²) partials, and the
  * partials are associative + commutative under addition). a3 answers
  * "aggregate a corpus once"; mv1 answers "keep a day-partitioned
  * metric fresh forever at O(new day) cost".
  *
  * Exactness discipline: `value` is quantized to integer centi-units
  * (the fixture's values are exact 2-decimal) so every state component
  * is an exact BIGINT — state merge is integer arithmetic with no
  * float-order dependence, and only the final presentation divides and
  * rounds (the a3 discipline, shared verbatim with the oracle SQL).
  *
  * 100 TB design: the state table is (days × groups) rows — ~1000×
  * smaller than the events it summarizes — served through
  * [[graft.sinks.VersionedStore]] so refreshes are fingerprint-keyed
  * and readers never see a partial fold. The daily refresh scans ONLY
  * the new day (the ts range predicate pushes into the parquet scan —
  * PlanSpec-pinned), computes its partials map-side, and the serve-time
  * merge aggregates the bounded state table, never the event history.
  * The same algebra runs at ingest in [[graft.streaming.StreamRollup]]
  * (per-micro-batch partials, replay-idempotent store), whose served
  * result OpsSpec holds equal to this batch chain.
  */
object Rollup {

  /** The fixture's final day, playing "today's incoming batch": the
    * seed state artifact covers everything strictly before it, and the
    * registered query folds this one day in incrementally.
    */
  val CutDay = "2024-01-30 00:00:00"

  /** Mergeable per-(day, event_type) aggregate states over an events
    * frame: exact integer components only.
    */
  def states(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("day"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("qv"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), sum("qv").as("s"),
        sum(expr("qv * qv")).as("sq"),
        min("qv").as("mn"), max("qv").as("mx"))

  /** Serve-time merge: fold states per group by integer algebra, then
    * present mean/min/max/std in value units (divide + round LAST —
    * textually parallel with the oracle). `n_days` counts DISTINCT
    * state days, pinning day granularity while staying correct when
    * the same day arrives as several partials (the streaming twin's
    * micro-batches can split a day).
    */
  def merge(stateRows: DataFrame): DataFrame =
    stateRows.groupBy("event_type")
      .agg(sum("n").as("n"), countDistinct(col("day")).as("n_days"),
        sum("s").as("s"), sum("sq").as("sq"),
        min("mn").as("mn"), max("mx").as("mx"))
      .select(col("event_type"), col("n"), col("n_days"),
        expr("round(cast(s as double) / 100.0 / n, 6)").as("avg_value"),
        expr("round(cast(mn as double) / 100.0, 2)").as("min_value"),
        expr("round(cast(mx as double) / 100.0, 2)").as("max_value"),
        expr("round(sqrt((cast(sq as double) - cast(s as double) * cast(s as double) / n)" +
          " / (n - 1)) / 100.0, 6)").as("std_value"))

  /** The seed state artifact: per-day states for every day BEFORE the
    * cut, materialized once per source fingerprint (VersionedStore
    * cache) — the "all of history, already folded" side the refresh
    * never rescans.
    */
  def seedStates(s: SparkSession, d: String): DataFrame =
    graft.sinks.VersionedStore.corpusArtifact(s, d, "rollup_states", "events",
      logicKey = s"v1:$CutDay") { out =>
      states(Tables.events(s, d).filter(col("ts") < lit(CutDay).cast("timestamp")))
        .write.parquet(out)
    }

  /** One incremental refresh step: partials of ONLY the new day — its
    * ts-range filter pushes into the events scan.
    */
  def newDayStates(s: SparkSession, d: String): DataFrame =
    states(Tables.events(s, d).filter(col("ts") >= lit(CutDay).cast("timestamp")))

  val defs: Seq[QueryDef] = Seq(

    // MV1: incremental rollup refresh + serve — seed store ∪ the new
    // day's partials, merged by state algebra. The oracle recomputes
    // directly over ALL events with the same quantization: hash-match
    // IS the merge-equals-recompute theorem checked end to end.
    QueryDef.sql("mv1_incremental_rollup",
      """WITH q AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS qv
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |       COUNT(DISTINCT day) AS n_days,
        |       round(CAST(SUM(qv) AS DOUBLE) / 100.0 / COUNT(*), 6) AS avg_value,
        |       round(CAST(MIN(qv) AS DOUBLE) / 100.0, 2) AS min_value,
        |       round(CAST(MAX(qv) AS DOUBLE) / 100.0, 2) AS max_value,
        |       round(sqrt((CAST(SUM(qv * qv) AS DOUBLE)
        |                   - CAST(SUM(qv) AS DOUBLE) * CAST(SUM(qv) AS DOUBLE) / COUNT(*))
        |                  / (COUNT(*) - 1)) / 100.0, 6) AS std_value
        |FROM q GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      merge(seedStates(s, d).unionByName(newDayStates(s, d)))
        .orderBy("event_type")
    }
  )
}
