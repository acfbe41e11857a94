package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Small-file compaction PLANNING — the incremental half of the
  * table-maintenance pair ([[graft.sinks.Compaction]] is the other:
  * it rewrites a whole store through the VersionedStore publish
  * protocol; this operator decides WHICH files a maintenance pass
  * should touch, so a petabyte table is compacted incrementally
  * instead of rewritten). The operator every lakehouse runs
  * every lakehouse runs (Delta `OPTIMIZE`, Iceberg `rewrite_data_files`,
  * Hudi clustering): a long-lived table accretes ingest-sized files
  * whose per-file overhead (task scheduling, footer reads, open/seek)
  * dominates scan cost, so files below a target size are periodically
  * rewritten into target-sized groups while already-large files are
  * left untouched.
  *
  * Packing rule: within each partition, files pack in file-id order
  * (commit order — compaction concatenates row groups, preserving it)
  * by CUMULATIVE OFFSET: bin = floor(preceding-bytes / target). True
  * greedy first-fit ("close the bin when the next file would overflow")
  * is inherently sequential; offset-binning is its parallelizable
  * equivalent — one prefix-sum window computes every assignment, and
  * each non-final bin's mass provably lands in (target − maxSmall,
  * target + maxSmall), a bounded overshoot OpsSpec pins. The same rule
  * an engine can apply per partition with no coordination.
  *
  * The manifest here derives from `documents` (50-doc commit chunks per
  * source, byte mass = n_chars) purely as fixture machinery — in
  * production it IS the catalog's file listing, orders of magnitude
  * smaller than the data. 100 TB shape: one corpus scan builds the
  * manifest (materialized once — localCheckpoint stands in for reading
  * the catalog), then everything runs on file-count-sized rows: one
  * prefix-sum window per partition and per-bin window totals — no
  * joins, nothing data-sized.
  */
object CompactionPlan {

  /** Target compacted file size (bytes, fixture scale). */
  val Target = 1200L

  val defs: Seq[QueryDef] = Seq(

    // CMP1: the compaction plan — one row per manifest file with its
    // action ('compact' into bin k, or 'keep' as-is), plus the planned
    // group's file count and byte mass. The oracle recomputes the
    // manifest, the prefix sum, and the binning independently.
    QueryDef.sql("cmp1_compaction_plan",
      s"""WITH f AS (
         |  SELECT source, doc_id // 50 AS file_id, CAST(SUM(n_chars) AS BIGINT) AS size_bytes
         |  FROM documents GROUP BY 1, 2),
         |small AS (
         |  SELECT source, file_id, size_bytes,
         |         COALESCE(SUM(size_bytes) OVER (PARTITION BY source ORDER BY file_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM f WHERE size_bytes < $Target),
         |binned AS (
         |  SELECT source, file_id, size_bytes, CAST(cum_before // $Target AS BIGINT) AS bin
         |  FROM small)
         |SELECT source, file_id, size_bytes, 'compact' AS action, bin,
         |       COUNT(*) OVER (PARTITION BY source, bin) AS bin_files,
         |       CAST(SUM(size_bytes) OVER (PARTITION BY source, bin) AS BIGINT) AS bin_bytes
         |FROM binned
         |UNION ALL
         |SELECT source, file_id, size_bytes, 'keep' AS action,
         |       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
         |FROM f WHERE size_bytes >= $Target
         |ORDER BY source, file_id""".stripMargin) { (s, d) =>
      // the manifest is catalog metadata in production — build it once
      // (the query's single corpus scan) and plan over the checkpoint
      val f = Tables.documents(s, d)
        .select(col("source"), expr("doc_id div 50").as("file_id"), col("n_chars"))
        .groupBy("source", "file_id").agg(sum("n_chars").as("size_bytes"))
        .localCheckpoint()
      val binned = f.filter(col("size_bytes") < Target)
        .withColumn("cum_before", coalesce(sum("size_bytes").over(
          Window.partitionBy("source").orderBy("file_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("bin", expr(s"cum_before div $Target"))
      val grp = Window.partitionBy("source", "bin")
      val compact = binned.select(col("source"), col("file_id"),
        col("size_bytes"), lit("compact").as("action"), col("bin"),
        count(lit(1)).over(grp).as("bin_files"),
        sum("size_bytes").over(grp).as("bin_bytes"))
      val keep = f.filter(col("size_bytes") >= Target)
        .select(col("source"), col("file_id"), col("size_bytes"),
          lit("keep").as("action"), lit(null).cast("long").as("bin"),
          lit(null).cast("long").as("bin_files"), lit(null).cast("long").as("bin_bytes"))
      compact.unionByName(keep).orderBy("source", "file_id")
    }
  )
}
