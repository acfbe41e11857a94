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
        |            WHEN old.h <> new.h THEN 'updated'
        |            ELSE 'unchanged' END AS change
        |FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val neu = docs.filter(col("doc_id") % 5 =!= 3)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text"))).as("h"))
      old.as("o").join(neu.as("n"), col("o.doc_id") === col("n.doc_id"), "full_outer")
        .select(coalesce(col("o.doc_id"), col("n.doc_id")).as("doc_id"),
          when(col("o.doc_id").isNull, "inserted")
            .when(col("n.doc_id").isNull, "deleted")
            .when(col("o.h") =!= col("n.h"), "updated")
            .otherwise("unchanged").as("change"))
        .orderBy("doc_id")
    }
  )
}
