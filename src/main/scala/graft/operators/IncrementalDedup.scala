package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Incremental (cross-snapshot) exact dedup — the shape a production
  * ingestion pipeline actually runs: the accumulated corpus is NOT
  * rescanned per batch; only its content-fingerprint set is kept as a
  * materialized artifact, and each incoming batch is screened against
  * that store plus itself. d1 answers "dedup a corpus once"; d10
  * answers "keep a growing corpus deduped forever".
  *
  * Verdict per incoming doc, in precedence order:
  *  - `dup_of_corpus` — its hash is already in the fingerprint store;
  *  - `dup_in_batch`  — first seen in THIS batch under a lower doc_id
  *                      (and not in the store);
  *  - `new`           — goes into the corpus; its hash joins the store.
  *
  * 100 TB design: the store is hashes only (32 bytes/doc — ~1000×
  * smaller than the text), served through [[graft.sinks.VersionedStore]]
  * so rebuilds are fingerprint-keyed and readers never see a partial
  * store. The batch-vs-store join shuffles the small side per batch; at
  * full scale the store would be WRITTEN bucketed by hash (the
  * scale_bucketed_join technique) so the screen is a co-located join
  * with no store-side shuffle, and the post-screen append of `new`
  * hashes is the next store version — the same pointer-flip publish.
  * In-batch dedup is one window over the batch's own hashes. Corpus
  * text is never re-read.
  *
  * Test fixture: "existing" corpus = doc_id % 4 != 0; incoming batch =
  * the doc_id % 4 == 0 slice plus planted cross-batch copies
  * (existing % 20 == 1, re-keyed +2000000) and planted in-batch copies
  * (incoming % 40 == 0, re-keyed +3000000), so every verdict has
  * observable rows.
  */
object IncrementalDedup {

  /** Fingerprint store of the existing corpus: distinct md5(text),
    * materialized once per source fingerprint (VersionedStore cache).
    */
  def fingerprintStore(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.sinks.VersionedStore.corpusArtifact(s, d, "incdedup_fps") { out =>
      Tables.documents(s, d).filter(col("doc_id") % 4 =!= 0)
        .select(md5(col("text")).as("h")).distinct()
        .write.parquet(out)
    }

  /** The incoming batch of the test fixture: the held-out corpus slice
    * plus planted cross-batch and in-batch copies (see object doc).
    */
  def incomingBatch(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .union(docs.filter(col("doc_id") % 4 =!= 0 && col("doc_id") % 20 === 1)
        .select((col("doc_id") + 2000000).as("doc_id"), md5(col("text")).as("h")))
      .union(docs.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 3000000).as("doc_id"), md5(col("text")).as("h")))
  }

  /** The full-scale screen shape the d10 Scaladoc names: the
    * fingerprint store WRITTEN BUCKETED by hash (the scale_bucketed_join
    * technique), so the per-batch anti-join shuffles only the small
    * incoming batch into the store's bucketing and the store itself is
    * read in place — no store-side Exchange, ever (PlanSpec-pinned).
    * Returns the `new`-docs frame, result-identical to the plain screen.
    */
  def bucketedScreen(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val sfTag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9_]", "_")
    val table = s"incdedup_fps_b_$sfTag"
    // Cache keyed on the SOURCE fingerprint (same key discipline as
    // fingerprintStore's VersionedStore cache), carried as a table
    // property — existence alone would serve a stale screen after the
    // source dataset is regenerated at the same path.
    val fpKey = "graft.source_fingerprint"
    val fp = graft.sinks.VersionedStore.fingerprintOf(s, s"$d/documents.parquet")
    val fresh = s.catalog.tableExists(table) &&
      s.sql(s"SHOW TBLPROPERTIES $table").collect()
        .exists(r => r.getString(0) == fpKey && r.getString(1) == fp)
    if (!fresh) {
      if (s.catalog.tableExists(table)) s.sql(s"DROP TABLE $table")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      Tables.documents(s, d).filter(col("doc_id") % 4 =!= 0)
        .select(md5(col("text")).as("h")).distinct()
        .write.bucketBy(16, "h").sortBy("h")
        .mode("overwrite").saveAsTable(table)
      s.sql(s"ALTER TABLE $table SET TBLPROPERTIES ('$fpKey' = '$fp')")
    }
    incomingBatch(s, d).join(s.table(table), Seq("h"), "left_anti")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("d10_incremental_dedup",
      """WITH corpus_fp AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 4 <> 0),
        |incoming AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, md5(text) AS h FROM documents
        |  WHERE doc_id % 4 <> 0 AND doc_id % 20 = 1
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, md5(text) AS h FROM documents
        |  WHERE doc_id % 40 = 0),
        |marked AS (
        |  SELECT i.doc_id,
        |         cf.h IS NOT NULL AS in_corpus,
        |         MIN(i.doc_id) OVER (PARTITION BY i.h) AS batch_min
        |  FROM incoming i LEFT JOIN corpus_fp cf ON i.h = cf.h)
        |SELECT doc_id,
        |       CASE WHEN in_corpus THEN 'dup_of_corpus'
        |            WHEN batch_min < doc_id THEN 'dup_in_batch'
        |            ELSE 'new' END AS verdict
        |FROM marked ORDER BY doc_id""".stripMargin) { (s, d) =>
      incomingBatch(s, d)
        .join(fingerprintStore(s, d).withColumn("in_corpus", lit(true)), Seq("h"), "left")
        .withColumn("batch_min", min("doc_id").over(Window.partitionBy("h")))
        .select(col("doc_id"),
          when(col("in_corpus").isNotNull, "dup_of_corpus")
            .when(col("batch_min") < col("doc_id"), "dup_in_batch")
            .otherwise("new").as("verdict"))
        .orderBy("doc_id")
    }
  )
}
