package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction for parquet directories — the operational
  * counterpart of a streaming file sink. Append-mode micro-batches
  * write one file per partition per batch; at 100 TB/day that is
  * millions of kilobyte files, and scan planning starts to cost more
  * than scanning. Compaction rewrites a directory into ~target-sized
  * files with an atomic-swap publish:
  *
  *  1. read the live dir, repartition to ceil(bytes/target) partitions
  *     (repartition, not coalesce — even file sizes are the point),
  *  2. write to `<dir>__compact_tmp`,
  *  3. swap via two renames (live → __old, tmp → live) and delete
  *     __old. A reader sees the old or the new layout, never a mix of
  *     both; the only unreadable instant is between the two renames —
  *     on a real deployment the swap is a metastore/table-format
  *     pointer flip (Iceberg/Delta commit) instead of directory
  *     renames, but the rewrite stage is identical.
  */
object Compaction {

  /** Compact `dir` (a parquet directory) into files of roughly
    * `targetFileBytes`. Returns the number of files written.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val live = new Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery: a death between the two swap renames leaves live
    // missing with the data stranded in __compact_old — restore it
    // before doing anything else (same branch as the upsert sink).
    val oldP = new Path(s"${dir}__compact_old")
    if (!fs.exists(live) && fs.exists(oldP) && !fs.rename(oldP, live))
      throw new java.io.IOException(s"recovery rename $oldP -> $live failed")
    val bytes = fs.getContentSummary(live).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val tmp = new Path(s"${dir}__compact_tmp")
    val old = new Path(s"${dir}__compact_old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)

    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)

    if (!fs.rename(live, old)) throw new java.io.IOException(s"rename $live -> $old failed")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // roll back; leave tmp for inspection
      throw new java.io.IOException(s"rename $tmp -> $live failed (rolled back)")
    }
    fs.delete(old, true)
    nFiles
  }
}
