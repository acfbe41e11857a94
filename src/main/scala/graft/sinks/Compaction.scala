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
object Compaction {

  /** Compact the store at `dir` into files of roughly
    * `targetFileBytes`. Returns the number of files written.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcDir = VersionedStore.resolve(spark, dir)
      .getOrElse(migrateLegacy(spark, dir))
    val bytes = fs.getContentSummary(srcDir).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // publish prunes the superseded version after the pointer flip
    VersionedStore.publish(spark, dir) { out =>
      spark.read.parquet(srcDir.toString).repartition(nFiles)
        .write.parquet(out)
    }
    nFiles
  }

  /** One-time migration of a plain parquet directory into the
    * versioned layout: move the root-level files into a fresh version
    * dir, then flip the pointer. File moves are per-object (safe to
    * resume); the pointer flips only after every file is in place.
    */
  private def migrateLegacy(spark: SparkSession, dir: String): Path = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedStore.publish(spark, dir) { out =>
      val outPath = new Path(out)
      fs.mkdirs(outPath)
      fs.listStatus(base)
        .filter(st => st.isFile && st.getPath.getName != "LATEST" &&
          !st.getPath.getName.startsWith(".LATEST"))
        .foreach { st =>
          val dst = new Path(outPath, st.getPath.getName)
          if (!fs.rename(st.getPath, dst))
            throw new java.io.IOException(s"migrate ${st.getPath} -> $dst failed")
        }
      // a legacy dir always has _SUCCESS from its original Spark write;
      // create one if it predates that convention
      val marker = new Path(outPath, "_SUCCESS")
      if (!fs.exists(marker)) fs.create(marker, true).close()
    }
  }
}
