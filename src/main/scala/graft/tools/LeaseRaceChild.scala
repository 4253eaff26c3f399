package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Child process for the CROSS-PROCESS lease-atomicity proof
  * ([[graft.CrossProcessLeaseSpec]]). The in-process contract specs
  * race two Catalog instances inside one JVM, which exercises every
  * layer above the coordinator but cannot falsify the claim the
  * coordinator itself makes: that `createIfAbsent` is atomic ACROSS
  * PROCESSES (Hadoop's LocalFileSystem implements create-if-absent as
  * check-then-create, so two JVMs could both "win" a lease — the bug
  * the O_EXCL path in [[graft.sources.CommitCoordinator.fileAtomics]]
  * exists to close). Only separate JVMs can test that, so this main is
  * spawned K-ways against one directory and races the two primitives
  * the lease protocol stands on:
  *
  *  - acquisition: per round r, `createIfAbsent(<dir>/round_r__lease)`
  *    with this child's id as content — at most one process may win;
  *  - break-claim: rename of a parent-seeded stale file to a
  *    child-unique claim path — exactly one rename may succeed.
  *
  * Wins are recorded in a per-child file the parent cross-checks for
  * double-wins (the exact signature of non-atomic create-if-absent).
  * No Spark: the coordinator takes a raw Hadoop FileSystem, which is
  * all lease traffic ever touches.
  */
object LeaseRaceChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val childId = args(1)
    val rounds = args(2).toInt
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val coord = graft.sources.CommitCoordinator.fileAtomics

    // barrier: all children spin on the parent's go-file so the race
    // window actually overlaps instead of serializing on JVM startup
    // readiness barrier: announce this JVM is booted, then spin on the
    // parent's go-file — the parent releases only once EVERY child is
    // ready, so boot skew (seconds under a loaded host) cannot let one
    // early child sweep the rounds unopposed
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, s"ready_$childId"), "")
    val go = java.nio.file.Paths.get(dir, "go")
    val deadline = System.currentTimeMillis() + 60000
    while (!java.nio.file.Files.exists(go) &&
           System.currentTimeMillis() < deadline) Thread.sleep(1)

    val wins = new StringBuilder
    (0 until rounds).foreach { r =>
      if (coord.createIfAbsent(fs, new Path(s"$dir/round_${r}__lease"), childId))
        wins.append(s"create $r\n")
      // the break-claim shape: every child tries to claim the SAME
      // stale lease by renaming it to its own unique tomb path —
      // exactly one rename(src, dst) may observe src and win
      if (coord.rename(fs, new Path(s"$dir/stale_$r"),
          new Path(s"$dir/claimed_${r}_$childId")))
        wins.append(s"claim $r\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, s"wins_$childId"), wins.toString)
  }
}
