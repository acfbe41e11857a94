package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Data-quality integrity audit — the health gate a pipeline runs
  * between ingestion and training: referential integrity between the
  * corpus and its embedding table (every doc embedded, no orphan
  * vectors), plus per-vector invariants (declared dimensionality,
  * non-zero norm, no NaN poisoning) and per-doc invariants (non-empty
  * text). One summary row; any non-zero defect count fails the release.
  *
  * Shape at scale: two narrow scans with map-side aggregates plus two
  * anti-joins on the id (the only shuffles). Element checks are
  * higher-order array functions (`filter`/`exists`) — no explode, no
  * UDF. The synthetic tables are fully healthy, so one probe row per
  * defect class is planted on BOTH engine and oracle sides (the
  * m1/t9 probe idiom) — every counter is observably non-zero.
  */
object Audit {

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("qa1_integrity_audit",
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT CAST(9000001 AS BIGINT), 'orphan doc with no vector'
        |  UNION ALL SELECT CAST(9000006 AS BIGINT), ''),
        |v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT CAST(9000003 AS BIGINT), [CAST(1 AS FLOAT), CAST(2 AS FLOAT)]
        |  UNION ALL SELECT CAST(9000004 AS BIGINT),
        |            list_transform(generate_series(1, 64), x -> CAST(0 AS FLOAT))
        |  UNION ALL SELECT CAST(9000005 AS BIGINT),
        |            list_transform(generate_series(1, 64), x -> CAST('nan' AS FLOAT)))
        |SELECT
        |  (SELECT COUNT(*) FROM d) AS n_docs,
        |  (SELECT COUNT(*) FROM v) AS n_vecs,
        |  (SELECT COUNT(*) FROM d LEFT JOIN v ON d.doc_id = v.vec_id
        |   WHERE v.vec_id IS NULL) AS docs_missing_vec,
        |  (SELECT COUNT(*) FROM v LEFT JOIN d ON v.vec_id = d.doc_id
        |   WHERE d.doc_id IS NULL) AS vecs_missing_doc,
        |  (SELECT COUNT(*) FROM v WHERE len(embedding) <> 64) AS wrong_dim,
        |  (SELECT COUNT(*) FROM v
        |   WHERE len(list_filter(embedding, x -> x <> 0)) = 0) AS zero_norm,
        |  (SELECT COUNT(*) FROM v
        |   WHERE len(list_filter(embedding, x -> isnan(x))) > 0) AS with_nan,
        |  (SELECT COUNT(*) FROM d
        |   WHERE text IS NULL OR length(text) = 0) AS empty_texts""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .union(Seq((9000001L, "orphan doc with no vector"), (9000006L, ""))
          .toDF("doc_id", "text"))
      val vecs = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .union(Seq(
          (9000003L, Array(1.0f, 2.0f)),
          (9000004L, Array.fill(64)(0.0f)),
          (9000005L, Array.fill(64)(Float.NaN)))
          .toDF("vec_id", "embedding"))
      val docStats = docs.agg(count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1).otherwise(0))
          .as("empty_texts"))
      val vecStats = vecs.agg(count(lit(1)).as("n_vecs"),
        sum(when(size(col("embedding")) =!= 64, 1).otherwise(0)).as("wrong_dim"),
        sum(when(expr("size(filter(embedding, x -> x <> 0))") === 0, 1).otherwise(0))
          .as("zero_norm"),
        sum(when(expr("exists(embedding, x -> isnan(x))"), 1).otherwise(0))
          .as("with_nan"))
      val docsMissing = docs.join(vecs, docs("doc_id") === vecs("vec_id"), "left_anti")
        .agg(count(lit(1)).as("docs_missing_vec"))
      val vecsMissing = vecs.join(docs, vecs("vec_id") === docs("doc_id"), "left_anti")
        .agg(count(lit(1)).as("vecs_missing_doc"))
      docStats.crossJoin(vecStats).crossJoin(docsMissing).crossJoin(vecsMissing)
        .select(col("n_docs"), col("n_vecs"), col("docs_missing_vec"),
          col("vecs_missing_doc"), col("wrong_dim"), col("zero_norm"),
          col("with_nan"), col("empty_texts"))
    }
  )
}
