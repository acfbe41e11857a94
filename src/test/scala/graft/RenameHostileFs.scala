package graft

import java.io.IOException
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileStatus, Path, RawLocalFileSystem}

/** Test double of an object store's rename semantics, registered under
  * the `s3x://` scheme: any DIRECTORY rename throws. On S3A a directory
  * rename is a non-atomic O(n) server-side copy — the exact failure mode
  * [[graft.sinks.VersionedStore]]'s publish protocol exists to avoid —
  * so running the full store/compaction/repair spec family on this FS
  * proves the "never renames a data directory" invariant mechanically
  * instead of by code inspection. Single-FILE renames stay allowed: that
  * is the pointer-flip primitive (one-object copy+delete, i.e. one
  * atomic PUT on a real store).
  *
  * One exemption: paths under the committer's `_temporary` tree. Spark's
  * stock FileOutputCommitter merges task dirs by directory rename; on a
  * real object store that committer is replaced wholesale (S3A magic
  * committer), which is orthogonal to the store protocol under test.
  * Everything the VersionedStore/Compaction code itself does runs with
  * directory renames forbidden.
  */
class RenameHostileFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3x"
  override def getUri: URI = URI.create("s3x:///")

  override def rename(src: Path, dst: Path): Boolean = {
    // exact path-SEGMENT match, not a substring test — a store path that
    // merely contains "_temporary" in a file name must not escape the check
    def inCommitterTree(p: Path): Boolean =
      p.toUri.getPath.split('/').contains("_temporary")
    val exempt = inCommitterTree(src) || inCommitterTree(dst)
    if (!exempt && exists(src) && getFileStatus(src).isDirectory)
      throw new IOException(
        s"object-store contract violation: directory rename $src -> $dst " +
          "(non-atomic O(n) copy on S3A)")
    super.rename(src, dst)
  }
}

/** FileContext-side twin: [[graft.sinks.VersionedStore]] flips pointers
  * through `FileContext.rename(OVERWRITE)`, which resolves an
  * AbstractFileSystem, not a FileSystem — this delegate routes those
  * calls into the same hostile rename above.
  */
class RenameHostileAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new RenameHostileFileSystem(), conf, "s3x", false)

/** Models object-store listing inconsistency on top of the rename-hostile
  * semantics, under the `s3p://` scheme: `listStatus` NEVER returns
  * `.INTENT.*` lease objects — the worst case of S3A ListObjectsV2
  * pagination, where '.INTENT.x' sorts before 'v_x' and a lease created
  * after its page was served is invisible while the later-created version
  * dir IS listed. Point reads (`getFileStatus`/`exists`) still see the
  * lease, exactly as a HEAD does on a real store. Prune logic that trusts
  * the listing alone deletes an in-flight writer's version on this FS;
  * the point-check survives it.
  */
class PagedListingFileSystem extends RenameHostileFileSystem {
  override def getScheme: String = "s3p"
  override def getUri: URI = URI.create("s3p:///")
  override def listStatus(p: Path): Array[FileStatus] =
    super.listStatus(p).filterNot(_.getPath.getName.startsWith(".INTENT."))
}

class PagedListingAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new PagedListingFileSystem(), conf, "s3p", false)
