package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Snapshot diff — the CDC primitive under every lakehouse MERGE /
  * incremental-sync job: given two snapshots of a keyed table, classify
  * every key as inserted / deleted / updated / unchanged. One full
  * outer join on the key with a content-hash comparison — at scale the
  * join shuffles both snapshots on the key ONCE, and rows are reduced
  * to (key, md5) BEFORE the join, so the shuffle carries ~48 bytes per
  * row, never document bodies (the same hashes-only discipline as
  * d10's fingerprint store; with both snapshots bucket-written on the
  * key — scale_bucketed_join — the diff is co-located and shuffle-free).
  *
  * Fixture derives both snapshots from `documents` deterministically:
  * OLD = doc_id % 5 != 4, NEW = doc_id % 5 != 3 (so % 5 == 4 rows are
  * inserted, % 5 == 3 deleted), and NEW rewrites text for doc_id % 7
  * == 0 (updated); everything else is unchanged.
  */
object SnapshotDiff {

  import org.apache.spark.sql.{Column, DataFrame, SparkSession}

  /** cdc1's classification between two arbitrary keyed snapshots:
    * inserted / deleted / updated / unchanged per key, with rows
    * reduced to (key, hash-of-content) BEFORE the one full outer join.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      key: String, content: Column): DataFrame = {
    def h(df: DataFrame) = df.select(col(key), md5(content).as("h"))
    h(oldSnap).as("o")
      .join(h(newSnap).as("n"), col(s"o.$key") === col(s"n.$key"), "full_outer")
      .select(coalesce(col(s"o.$key"), col(s"n.$key")).as(key),
        when(col(s"o.$key").isNull, "inserted")
          .when(col(s"n.$key").isNull, "deleted")
          // null-safe: a NULL↔value content change must classify as
          // updated, not fall through NULL to 'unchanged' (SQL twin:
          // `o.h IS DISTINCT FROM n.h`)
          .when(!(col("o.h") <=> col("n.h")), "updated")
          .otherwise("unchanged").as("change"))
  }

  /** Time-travel CDC: what changed between two RETAINED versions of a
    * VersionedStore table (`publish(keepVersions = N)`) — the "what did
    * yesterday's publish do" audit, without any change log: the
    * versions themselves are the log. Same join budget as cdc1.
    */
  def diffVersions(spark: SparkSession, base: String,
      oldVersion: String, newVersion: String,
      key: String, content: Column): DataFrame =
    diff(graft.sinks.VersionedStore.readVersion(spark, base, oldVersion),
      graft.sinks.VersionedStore.readVersion(spark, base, newVersion),
      key, content)

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("cdc1_snapshot_diff",
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 <> 4),
        |new AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
        |                  ELSE text END) AS h
        |  FROM documents WHERE doc_id % 5 <> 3)
        |SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
        |       CASE WHEN old.doc_id IS NULL THEN 'inserted'
        |            WHEN new.doc_id IS NULL THEN 'deleted'
        |            WHEN old.h IS DISTINCT FROM new.h THEN 'updated'
        |            ELSE 'unchanged' END AS change
        |FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id"), col("text"))
      val neu = docs.filter(col("doc_id") % 5 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"))
      diff(old, neu, "doc_id", col("text")).orderBy("doc_id")
    },

    /* MERGE apply — the other half of the CDC pair: cdc1 DERIVES a
     * changeset from two snapshots; cdc2 APPLIES one (upserts + deletes)
     * to a base snapshot, i.e. `MERGE INTO base USING changes` (the
     * Delta/Iceberg MERGE semantics: WHEN MATCHED AND op='delete' THEN
     * DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT).
     *
     * Shape at 100 TB: a changeset is orders of magnitude smaller than
     * the snapshot it lands on, so the touched-key screen BROADCASTS —
     * the base is scanned map-only (anti-join against a broadcast hash
     * set), never shuffled, and the upsert rows union in afterward. A
     * same-size merge would flip to the cdc1 shape (one key shuffle,
     * hashes-only); the two queries bracket both regimes.
     *
     * Fixture: base = doc_id % 5 <> 4 (cdc1's OLD); changeset = revised
     * text for doc_id % 7 == 0 (upsert: updates when the key is in base,
     * inserts the % 5 == 4 ones that are not) + deletes for doc_id % 11
     * == 3 not already upserted. Rows are reduced to (doc_id, md5) before
     * the merge — body bytes never cross the join.
     */
    QueryDef.sql("cdc2_merge_apply",
      """WITH base AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 <> 4),
        |chg AS (
        |  SELECT doc_id, md5(text || ' [rev2]') AS h, 'upsert' AS op
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, CAST(NULL AS VARCHAR) AS h, 'delete' AS op
        |  FROM documents WHERE doc_id % 11 = 3 AND doc_id % 7 <> 0),
        |merged AS (
        |  SELECT b.doc_id, b.h, 'kept' AS action FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.doc_id = b.doc_id)
        |  UNION ALL
        |  SELECT doc_id, h, 'upserted' AS action FROM chg WHERE op = 'upsert')
        |SELECT doc_id, h, action FROM merged ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val base = docs.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val chg = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), md5(concat(col("text"), lit(" [rev2]"))).as("h"),
          lit("upsert").as("op"))
        .union(docs.filter(col("doc_id") % 11 === 3 && col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), lit(null).cast("string").as("h"),
            lit("delete").as("op")))
      val untouched = base.join(broadcast(chg.select("doc_id")), Seq("doc_id"), "left_anti")
        .withColumn("action", lit("kept"))
      untouched
        .union(chg.filter(col("op") === "upsert")
          .select(col("doc_id"), col("h"), lit("upserted").as("action")))
        .orderBy("doc_id")
    },

    // P13: schema evolution across snapshot versions — the lakehouse
    // ingest primitive cdc1/cdc2 assume away: version 1 wrote
    // (doc_id, text, lang), version 2 dropped `lang` and added
    // (source, n_chars). Reading both eras as one table means
    // union-by-NAME with NULL fill for each era's missing columns
    // (Spark `unionByName(allowMissingColumns = true)`, DuckDB
    // `UNION ALL BY NAME` — Delta/Iceberg mergeSchema semantics).
    // Positional UNION would silently misalign columns; this keeps
    // the contract observable: every v1 row has lang and NULL
    // source/n_chars, every v2 row the reverse. Map-only per era +
    // the oracle ORDER BY — nothing shuffles to evolve a schema.
    QueryDef.sql("p13_schema_evolve",
      """WITH v1 AS (SELECT doc_id, text, lang, 1 AS version
        |            FROM documents WHERE doc_id % 2 = 0),
        |v2 AS (SELECT doc_id, text, source, n_chars, 2 AS version
        |       FROM documents WHERE doc_id % 2 = 1)
        |SELECT doc_id, version, lang, source, n_chars, length(text) AS len
        |FROM (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val v1 = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("lang"), lit(1).as("version"))
      val v2 = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"),
          lit(2).as("version"))
      v1.unionByName(v2, allowMissingColumns = true)
        .select(col("doc_id"), col("version"), col("lang"), col("source"),
          // Spark length() is INT, DuckDB's BIGINT — align
          col("n_chars"), length(col("text")).cast("long").as("len"))
        .orderBy("doc_id")
    },

    // CDC3: SCD Type-2 dimension build — the third leg of the CDC
    // family: cdc1 DERIVES a changeset, cdc2 APPLIES one, cdc3 builds
    // the HISTORY table warehouses keep for as-of queries (Kimball's
    // slowly-changing-dimension type 2): from each key's attribute
    // change stream, one row per consecutive run of the same value
    // with [valid_from, valid_to) validity, a dense version number,
    // and the open current row (valid_to NULL, is_current = 1).
    // Fixture: each user's event_type stream is the attribute history.
    // Classic gaps-and-islands — change flags via lag, run ids via a
    // running sum (ROWS frame pinned identically in both engines so
    // the two window semantics can never diverge on a tie), one
    // group-by to the run grain, one lead for interval chaining.
    // 100 TB shape: ONE shuffle on the dimension key; every window
    // and the run aggregation reuse that same partitioning (Spark
    // plans a single Exchange — the whole history build is
    // key-local), and the output is run-grain, smaller than the
    // input. The as-of lookup this table exists for is j6's range
    // join / aj1's as-of join downstream.
    QueryDef.sql("cdc3_scd2",
      """WITH flags AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id, ts, event_type,
        |         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS run
        |  FROM flags),
        |iv AS (
        |  SELECT user_id, run, event_type AS segment,
        |         MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM runs GROUP BY 1, 2, 3)
        |SELECT user_id, CAST(run AS BIGINT) AS version, segment, valid_from,
        |       lead(valid_from) OVER v AS valid_to,
        |       CAST(CASE WHEN lead(valid_from) OVER v IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS is_current,
        |       n_events
        |FROM iv
        |WINDOW v AS (PARTITION BY user_id ORDER BY run)
        |ORDER BY user_id, version""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val byRun = Window.partitionBy("user_id").orderBy(col("run"))
      val flags = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("chg",
          when(!(lag(col("event_type"), 1).over(byTime) <=> col("event_type")), 1L)
            .otherwise(0L))
      val runs = flags.withColumn("run",
        sum(col("chg")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      runs.groupBy(col("user_id"), col("run"), col("event_type").as("segment"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).cast("long").as("n_events"))
        .select(col("user_id"), col("run").cast("long").as("version"), col("segment"),
          col("valid_from"),
          lead(col("valid_from"), 1).over(byRun).as("valid_to"),
          col("n_events"))
        .withColumn("is_current",
          when(col("valid_to").isNull, 1L).otherwise(0L))
        .select("user_id", "version", "segment", "valid_from", "valid_to",
          "is_current", "n_events")
        .orderBy("user_id", "version")
    }
  )
}
