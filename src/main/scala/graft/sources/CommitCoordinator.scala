package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic primitives the catalog's coordination layer stands on —
  * lease acquisition (create-if-absent), stale-lease breaking and
  * stage-and-swap publishing (atomic rename), fence/stamp reads — made
  * PLUGGABLE so the warehouse can live on stores with different
  * atomicity guarantees:
  *
  *  - HDFS-like stores (HDFS, local fs, most HCFS): the default
  *    [[CommitCoordinator.fileAtomics]] below — `create(overwrite =
  *    false)` and `rename` are atomic namespace operations, with a
  *    java.nio O_EXCL path for the local filesystem (Hadoop's
  *    `LocalFileSystem` implements create-if-absent as CHECK-then-
  *    create, which two processes can both win; `CREATE_NEW` maps to
  *    O_EXCL, atomic across processes on POSIX).
  *  - Object stores (S3-shaped): neither create-if-absent nor rename
  *    is atomic — plug in an implementation backed by conditional PUTs
  *    (If-None-Match / If-Match) or an external lock service, and
  *    every lease/break/fence/swap point in [[Catalog]] inherits the
  *    guarantee without further change.
  *
  * Methods take the resolved Hadoop [[FileSystem]] so one coordinator
  * serves every warehouse a Catalog touches; implementations that
  * coordinate OUTSIDE the filesystem (a lock service, a database) may
  * ignore it entirely for coordination state: every reader of a lease,
  * break-claim, or layout stamp goes through the coordinator's own
  * [[readSmall]], so materializing those small files on the filesystem
  * is OPTIONAL, not required — the key-value reference implementation
  * keeps them purely in its map, and LifecycleContractSpec asserts no
  * `__lease` file ever touches disk under it. Only DATA directories
  * (stage-and-swap renames, recursive deletes) must remain real
  * filesystem paths, since Spark jobs read and write them directly.
  */
trait CommitCoordinator {

  /** Atomically create `path` holding `content` iff it does not exist.
    * Returns false (writing nothing) when it already exists. The
    * exclusion primitive behind lease acquisition and layout-stamp
    * first-write. */
  def createIfAbsent(fs: FileSystem, path: Path, content: String): Boolean

  /** Read a small coordination file. None when absent or unreadable —
    * callers that must distinguish retry once ([[Catalog.fenceHeldLeases]]). */
  def readSmall(fs: FileSystem, path: Path): Option[String]

  /** Atomic rename, false on failure. Used for the stale-lease
    * rename-claim (exactly one of two simultaneous breakers wins) and
    * every stage-and-swap publish (file or directory). */
  def rename(fs: FileSystem, src: Path, dst: Path): Boolean

  /** Delete (recursively when a directory); false/ignored on failure. */
  def delete(fs: FileSystem, path: Path, recursive: Boolean): Boolean
}

object CommitCoordinator {

  /** Default coordinator: Hadoop FS atomics, with the java.nio O_EXCL
    * path for `file:` schemes (see trait doc). Correct on HDFS-like
    * stores; the documented object-store caveat lives HERE now — an
    * S3 deployment swaps this object, not the catalog. */
  val fileAtomics: CommitCoordinator = new CommitCoordinator {

    def createIfAbsent(fs: FileSystem, path: Path, content: String): Boolean =
      if (fs.getScheme == "file") {
        // Hadoop LocalFileSystem's create(overwrite=false) is
        // check-then-create — racy across processes. O_EXCL is not.
        val nio = java.nio.file.Paths.get(path.toUri.getPath)
        try {
          if (nio.getParent != null)
            java.nio.file.Files.createDirectories(nio.getParent)
          java.nio.file.Files.write(nio, content.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      } else
        try {
          val out = fs.create(path, false)
          try out.write(content.getBytes("UTF-8")) finally out.close()
          true
        } catch { case _: java.io.IOException => false }

    def readSmall(fs: FileSystem, path: Path): Option[String] =
      try {
        val in = fs.open(path)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      } catch { case _: java.io.IOException => None }

    def rename(fs: FileSystem, src: Path, dst: Path): Boolean =
      try fs.rename(src, dst)
      catch { case _: java.io.IOException => false }

    def delete(fs: FileSystem, path: Path, recursive: Boolean): Boolean =
      try fs.delete(path, recursive)
      catch { case _: java.io.IOException => false }
  }

  /** REFERENCE implementation of the external-coordinator shape: the
    * small coordination FILES (leases, layout stamps, break-claims)
    * live in a linearizable key-value map — the structure a lock
    * service, a database row, or an S3 conditional-PUT provides — while
    * DATA directories (the stage-and-swap renames, recursive deletes)
    * still go to the filesystem via `delegate`. This is exactly the
    * split an object-store deployment needs: the store's rename may be
    * non-atomic, but every EXCLUSION decision happens in the
    * coordinator, so the swap windows are single-writer anyway.
    *
    * Process-local (a ConcurrentHashMap), so it coordinates clients
    * that SHARE the instance — the template for a networked
    * implementation, and the fixture the contract specs run the full
    * index lifecycle through to prove the seam is load-bearing.
    */
  def keyValue(
      delegate: CommitCoordinator = fileAtomics): CommitCoordinator =
    new CommitCoordinator {
      private val kv =
        new java.util.concurrent.ConcurrentHashMap[String, String]

      def createIfAbsent(fs: FileSystem, path: Path, content: String): Boolean =
        kv.putIfAbsent(path.toString, content) == null

      def readSmall(fs: FileSystem, path: Path): Option[String] =
        Option(kv.get(path.toString))
          .orElse(delegate.readSmall(fs, path))

      def rename(fs: FileSystem, src: Path, dst: Path): Boolean = {
        // a rename of a coordination KEY is the atomic break-claim:
        // remove-and-put must admit exactly one winner, which remove's
        // linearizability gives us
        val v = kv.remove(src.toString)
        if (v != null) { kv.put(dst.toString, v); true }
        else delegate.rename(fs, src, dst)
      }

      def delete(fs: FileSystem, path: Path, recursive: Boolean): Boolean =
        if (kv.remove(path.toString) != null) true
        else delegate.delete(fs, path, recursive)
    }
}
