package graft

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sinks.{Compaction, VersionedStore}

/** Runs the VersionedStore publish/repair/migration/compaction family on
  * the rename-hostile `s3x://` filesystem ([[RenameHostileFileSystem]]):
  * every scenario here fails with "directory rename" the moment any code
  * path falls back to the rename-a-directory idiom that is non-atomic on
  * object stores. This is the mechanical proof of the committer's design
  * claim (VersionedStore.scala header) that the POSIX-local OpsSpec runs
  * cannot give.
  */
class ObjectStoreSpec extends SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def s3x(prefix: String): String = {
    hconf.set("fs.s3x.impl", classOf[RenameHostileFileSystem].getName)
    hconf.set("fs.AbstractFileSystem.s3x.impl",
      classOf[RenameHostileAbstractFs].getName)
    s"s3x://${tmpDir(prefix)}"
  }

  test("harness: s3x rejects directory renames, allows file renames and honest create semantics") {
    val base = new Path(s3x("s3x-harness"))
    val f = base.getFileSystem(hconf)
    f.mkdirs(new Path(base, "adir"))
    intercept[IOException] {
      f.rename(new Path(base, "adir"), new Path(base, "bdir"))
    }
    // file rename stays allowed — that is the pointer-flip primitive
    val file = new Path(base, "afile")
    f.create(file, true).close()
    assert(f.rename(file, new Path(base, "bfile")))
    // create(overwrite=false) on an existing object fails instead of
    // silently winning the race
    intercept[IOException] { f.create(new Path(base, "bfile"), false).close() }
  }

  test("publish / read / grace / prune cycle completes with directory renames forbidden") {
    val store = s3x("s3x-pub") + "/artifact"
    def pub(n: Int) = VersionedStore.publish(spark, store) { out =>
      spark.range(0, n).toDF("id").write.parquet(out)
    }
    pub(10)
    assert(VersionedStore.read(spark, store).count() == 10)
    pub(20)
    assert(VersionedStore.read(spark, store).count() == 20)
    pub(30)
    assert(VersionedStore.read(spark, store).count() == 30)
    // pointer flips + pruning both ran on the hostile FS: live + one
    // grace version survive, everything older is gone
    val f = new Path(store).getFileSystem(hconf)
    assert(f.listStatus(new Path(store))
      .count(_.getPath.getName.startsWith("v_")) == 2)
  }

  test("lost-pointer repair and fingerprint-keyed readOrBuild run on the hostile store") {
    val src = s3x("s3x-src") + "/tbl"
    val store = s3x("s3x-cache") + "/artifact"
    spark.range(0, 12).toDF("id").write.parquet(src)
    def build() = VersionedStore.readOrBuild(spark, store,
      VersionedStore.fingerprintOf(spark, src)) { out =>
      spark.read.parquet(src).write.parquet(out)
    }
    assert(build().count() == 12)
    val f = new Path(store).getFileSystem(hconf)
    f.delete(new Path(store, "LATEST"), false)
    // repair re-points at the surviving complete version — via the same
    // single-FILE tmp-write + rename primitive, never a dir rename
    assert(VersionedStore.repair(spark, store).nonEmpty)
    assert(VersionedStore.read(spark, store).count() == 12)
    // and the cache still serves (fingerprint was reset by repair, so a
    // keyed read conservatively rebuilds — also rename-free)
    assert(build().count() == 12)
  }

  test("prune point-checks the lease: a listing that misses a just-created intent cannot kill an in-flight version") {
    hconf.set("fs.s3p.impl", classOf[PagedListingFileSystem].getName)
    hconf.set("fs.AbstractFileSystem.s3p.impl",
      classOf[PagedListingAbstractFs].getName)
    val store = s"s3p://${tmpDir("s3p-prune")}/artifact"
    def pub(n: Int) = VersionedStore.publish(spark, store) { out =>
      spark.range(0, n).toDF("id").write.parquet(out)
    }
    pub(1); pub(2)
    val base = new Path(store)
    val f = base.getFileSystem(hconf)
    // an in-flight second writer: live lease + partially-written version
    // dir, pointer not yet flipped
    val inflight = "v_9999999999999_deadbeef"
    f.mkdirs(new Path(base, inflight))
    f.create(new Path(base, s".INTENT.$inflight"), true).close()
    // the paginated listing genuinely misses the lease...
    assert(!f.listStatus(base).exists(_.getPath.getName.startsWith(".INTENT.")))
    // ...while a point read still sees it (the HEAD the fix relies on)
    assert(f.exists(new Path(base, s".INTENT.$inflight")))
    val before = f.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith("v_")).toSet
    pub(3) // prune runs: keep = {v3, grace v2}; v1 unleased, inflight leased
    val after = f.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith("v_")).toSet
    assert(after.contains(inflight),
      "leased in-flight version must survive a lease-blind listing")
    // and prune still prunes: exactly the unpointed, unleased v1 is gone
    assert((before -- after).size == 1 && !(before -- after).contains(inflight))
    assert(VersionedStore.read(spark, store).count() == 3)
  }

  test("legacy migration + compaction of a fragmented store never rename a directory") {
    val dir = s3x("s3x-compact") + "/events_sink"
    spark.range(0, 500).toDF("id").repartition(16).write.parquet(dir)
    // migrates the root files into the versioned layout (per-FILE moves),
    // compacts, publishes, prunes — the full protocol on the hostile FS
    Compaction.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(VersionedStore.read(spark, dir).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq ==
      (0L until 500L))
    // second compaction exercises the already-versioned fast path
    Compaction.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(VersionedStore.read(spark, dir).count() == 500)
  }

  test("partitioned compaction (hive layout) works with directory renames forbidden") {
    val dir = s3x("s3x-part") + "/by_day"
    spark.range(0, 300).toDF("id")
      .withColumn("day", (col("id") % 3).cast("string"))
      .repartition(8)
      .write.partitionBy("day").parquet(dir)
    Compaction.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024,
      partitionBy = Seq("day"))
    val back = VersionedStore.read(spark, dir)
    assert(back.count() == 300)
    assert(back.select("day").distinct().count() == 3)
  }

  test("retention + time travel + rollback: pointer-only history on the hostile FS") {
    val store = s3x("s3x-tt") + "/table"
    def pub(n: Int) = VersionedStore.publish(spark, store, keepVersions = 2) { out =>
      spark.range(0, n).toDF("id").write.parquet(out)
    }
    pub(10); pub(20)
    val v3 = pub(30).getName
    // retention keeps the newest 2 as time-travel targets; the first
    // publish's version must be pruned (it is neither retained nor the
    // grace version of the LAST publish)
    val versions = VersionedStore.listVersions(spark, store)
    assert(versions.length == 2 && versions.last == v3,
      s"expected 2 retained versions ending at $v3, got $versions")
    val v2 = versions.head
    // time travel: the superseded version stays readable by name
    assert(VersionedStore.readVersion(spark, store, v2).count() == 20)
    assert(VersionedStore.read(spark, store).count() == 30)
    // a pruned version is a loud failure, not an empty frame
    intercept[java.io.FileNotFoundException] {
      VersionedStore.readVersion(spark, store, "v_0000000000000_deadbeef")
    }
    // rollback: pointer-only flip — the live read serves the old data,
    // no data directory was moved or rewritten (hostile FS would throw),
    // and the newer version is still there to roll forward to
    VersionedStore.rollback(spark, store, v2)
    assert(VersionedStore.read(spark, store).count() == 20)
    assert(VersionedStore.listVersions(spark, store).contains(v3))
    VersionedStore.rollback(spark, store, v3)
    assert(VersionedStore.read(spark, store).count() == 30)
    // rollback to a version that never committed must refuse
    intercept[java.io.FileNotFoundException] {
      VersionedStore.rollback(spark, store, "v_0000000000000_deadbeef")
    }
    // the next publish prunes by retention from the rolled-forward state
    pub(40)
    val after = VersionedStore.listVersions(spark, store)
    assert(after.length == 2 && after.head == v3,
      s"retention after rollback should keep $v3 + the new version, got $after")
    assert(VersionedStore.read(spark, store).count() == 40)
  }

  test("time-travel CDC: diffVersions classifies the publish delta between retained versions") {
    import spark.implicits._
    val store = s3x("s3x-cdc") + "/table"
    def pub(rows: Seq[(Long, String)]) =
      VersionedStore.publish(spark, store, keepVersions = 2) { out =>
        rows.toDF("id", "body").write.parquet(out)
      }
    pub(Seq(1L -> "a", 2L -> "b", 3L -> "c")).getName
    val vNew = pub(Seq(2L -> "b", 3L -> "c2", 4L -> "d")).getName
    val Seq(vOld, _) = VersionedStore.listVersions(spark, store)
    val delta = graft.operators.SnapshotDiff
      .diffVersions(spark, store, vOld, vNew, "id", col("body"))
      .as[(Long, String)].collect().toMap
    assert(delta == Map(1L -> "deleted", 2L -> "unchanged",
      3L -> "updated", 4L -> "inserted"))
    assert(vNew != vOld)
  }
}
