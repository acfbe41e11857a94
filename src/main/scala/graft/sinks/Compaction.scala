package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction for parquet stores — the operational
  * counterpart of a streaming file sink. Append-mode micro-batches
  * write one file per partition per batch; at 100 TB/day that is
  * millions of kilobyte files, and scan planning starts to cost more
  * than scanning. Compaction rewrites the store into ~target-sized
  * files:
  *
  *  1. read the live version, repartition to ceil(bytes/target)
  *     partitions (repartition, not coalesce — even file sizes are the
  *     point),
  *  2. publish through [[VersionedStore]]: write a fresh immutable
  *     version dir, then atomically flip the single-object `LATEST`
  *     pointer. No directory rename anywhere, so the protocol holds on
  *     S3A (where dir rename is a non-atomic O(n) copy), and a reader
  *     sees the old or the new layout, never a mix — the same
  *     pointer-flip shape as an Iceberg/Delta commit.
  *
  * A store laid out the old way (parquet files directly at `dir`) is
  * migrated into the versioned layout on first touch: the files are
  * moved into a version dir and the pointer is flipped only once all of
  * them are in place (a crash mid-migration leaves the pointer absent
  * and the remaining files still at the root — rerunning resumes).
  */
// (This rewrites the WHOLE store; for the incremental variant — decide
// which files a maintenance pass should touch and which to leave — see
// the planner, graft.operators.CompactionPlan / cmp1.)
object Compaction {

  /** Compact the store at `dir` into files of roughly
    * `targetFileBytes`. Returns the EXACT number of data files written
    * (counted from the published version).
    *
    * `partitionBy` preserves a hive-partitioned layout (`day=.../...`):
    * rows are clustered by the partition columns (explicit partition
    * count — a bare repartition(cols) lets AQE coalesce the shuffle)
    * and the writer splits each task's output at `maxRecordsPerFile` =
    * target/avg-row-bytes, so a skewed partition value still lands in
    * ~target-sized files. Positional splitting handles NULL partition
    * values and duplicate-heavy data that any content-hash bucketing
    * scheme would collapse. Omitting `partitionBy` on a partitioned
    * store would flatten the layout (rows kept, pruning lost).
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Seq.empty): Int = {
    import org.apache.spark.sql.functions.col
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir)))
      throw new java.io.FileNotFoundException(s"no store at $dir")
    // resolution order: live pointer → lost-pointer repair (re-point to
    // the newest complete version; never merges) → legacy migration
    val srcDir = VersionedStore.resolve(spark, dir)
      .orElse(VersionedStore.repair(spark, dir))
      .getOrElse(migrateLegacy(spark, dir))
    def countParquet(p: Path): Int = fs.listStatus(p).map { st =>
      if (st.isDirectory) countParquet(st.getPath)
      else if (st.getPath.getName.endsWith(".parquet")) 1 else 0
    }.sum
    // a legitimately empty store (a _SUCCESS-only version) is already
    // as compact as it gets — rewriting it would only fail schema
    // inference on zero files
    if (countParquet(srcDir) == 0) return 0
    val bytes = fs.getContentSummary(srcDir).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // publish flips the pointer, keeps srcDir one round as the reader
    // grace window, and prunes anything older
    val version = VersionedStore.publish(spark, dir) { out =>
      val src = spark.read.parquet(srcDir.toString)
      if (partitionBy.isEmpty)
        src.repartition(nFiles).write.parquet(out)
      else {
        val totalRows = src.count()
        val rowsPerFile = // avg-row-size estimate; 0 rows -> no cap needed
          if (totalRows == 0) Long.MaxValue
          else math.max(1L, (targetFileBytes / (bytes.toDouble / totalRows)).toLong)
        // TRADEOFF: one write task per partition value (file sizes stay
        // ~target via the per-file cap, but a hot value is rewritten
        // serially). The parallel alternative — per-value hash buckets —
        // needs a NULL-safe counts join and a position-based (not
        // content-based) salt to split duplicate-heavy values; for an
        // offline maintenance pass, correctness-simple wins here.
        src.repartition(nFiles, partitionBy.map(col): _*)
          .write.option("maxRecordsPerFile", rowsPerFile)
          .partitionBy(partitionBy: _*).parquet(out)
      }
    }
    // exact count, honest across both paths (hash placement and the
    // per-file cap make any prediction approximate)
    countParquet(version)
  }

  /** One-time migration of a plain parquet directory into the
    * versioned layout: move the root-level entries — files AND
    * partition subdirectories (`day=.../part-*.parquet` layouts) —
    * into a fresh version dir, then flip the pointer. Moves are
    * per-entry (safe to resume); the pointer flips only after every
    * entry is in place.
    *
    * Crash discipline: the target dir gets a `_MIGRATING` marker FIRST
    * and loses it LAST, so a rerun can tell a crashed migration (merge
    * its contents back in) from a complete-but-unpointed version — a
    * crashed publish, or a grace-window version whose pointer was lost
    * — which is NEVER merged (merging a complete version alongside the
    * same data would silently duplicate every row; the lost-pointer
    * case is handled by [[VersionedStore.repair]] before this runs).
    * Migrating an empty dir throws BEFORE the pointer flip: no
    * pointer-to-nothing.
    */
  private def migrateLegacy(spark: SparkSession, dir: String): Path = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedStore.publish(spark, dir) { out =>
      val outPath = new Path(out)
      fs.mkdirs(outPath)
      val migrating = new Path(outPath, VersionedStore.MigratingMarker)
      fs.create(migrating, true).close()
      // returns 1 only for DATA entries; a _SUCCESS marker alone still
      // proves a real (legitimately empty) store — tracked separately
      // so a bare directory with neither fails the check below
      var sawMarker = false
      // Moves are per-FILE even for partition subdirectories (`day=...`):
      // a directory rename is a non-atomic O(n) copy on an object store —
      // the exact idiom this layout exists to avoid (ObjectStoreSpec runs
      // this path with directory renames forbidden). Subdirs are
      // recreated at the destination and their files moved one by one;
      // per-file moves also stay resumable after a crash.
      def moveInto(st: org.apache.hadoop.fs.FileStatus, dstDir: Path): Int = {
        val name = st.getPath.getName
        val dst = new Path(dstDir, name)
        if (st.isDirectory) {
          fs.mkdirs(dst)
          val n = fs.listStatus(st.getPath).map(moveInto(_, dst)).sum
          fs.delete(st.getPath, true) // only dup markers can remain
          n
        } else {
          // only a ROOT-level _SUCCESS proves a real (possibly empty)
          // store; a partition-level marker (day=0/_SUCCESS) with zero
          // data files must still fail the nothing-to-migrate guard
          if (name == "_SUCCESS" && dstDir == outPath) sawMarker = true
          if (fs.exists(dst) && name.startsWith("_")) 0 // dup marker
          else if (!fs.rename(st.getPath, dst))
            throw new java.io.IOException(s"migrate ${st.getPath} -> $dst failed")
          else if (name.startsWith("_")) 0
          else 1
        }
      }
      def move(st: org.apache.hadoop.fs.FileStatus): Int = moveInto(st, outPath)
      val entries = fs.listStatus(base).filterNot { st =>
        val n = st.getPath.getName
        n == "LATEST" || n.startsWith(".LATEST") ||
          n.startsWith(".INTENT.") || n == outPath.getName
      }
      val (versionDirs, plain) = entries.partition(st =>
        st.isDirectory && st.getPath.getName.startsWith("v_"))
      var moved = plain.map(move).sum
      versionDirs.foreach { o =>
        if (fs.exists(new Path(o.getPath, VersionedStore.MigratingMarker))) {
          // crashed prior migration: pull its already-moved files in
          moved += fs.listStatus(o.getPath)
            .filterNot(_.getPath.getName == VersionedStore.MigratingMarker)
            .map(move).sum
          fs.delete(o.getPath, true)
        } // else: complete or crashed PUBLISH — left for prune/repair
      }
      if (moved == 0 && !sawMarker)
        throw new java.io.IOException(s"nothing to migrate at $dir")
      fs.delete(migrating, false)
      val marker = new Path(outPath, "_SUCCESS")
      if (!fs.exists(marker)) fs.create(marker, true).close()
    }
  }
}
