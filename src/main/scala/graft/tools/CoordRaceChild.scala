package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Child process for the cross-process proof of the DURABLE REMOTE
  * coordinator ([[graft.CrossProcessCoordSpec]]) — the same two-races
  * shape as [[LeaseRaceChild]] (lease create-if-absent + stale-lease
  * rename-claim, exactly one winner each), but the primitives run
  * through [[graft.sources.CommitCoordinator.remote]] against one
  * [[graft.sources.CoordServer]], so what is being falsified-or-
  * confirmed is the server's linearizability ACROSS PROCESS BOUNDARIES
  * rather than POSIX O_EXCL. The contended keys live only in the
  * server (the parent seeds the stale ones through a client); the
  * filesystem carries just the go-file barrier and each child's win
  * log.
  *
  * Args: `<dir> <childId> <rounds> <port>`.
  */
object CoordRaceChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val childId = args(1)
    val rounds = args(2).toInt
    val port = args(3).toInt
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val coord = graft.sources.CommitCoordinator.remote("127.0.0.1", port)

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
      // NOTE: rename MISS falls back to delegate fs-rename, which also
      // misses (the stale keys exist only in the server) — a loss stays
      // a loss; only the server can award the claim
      if (coord.rename(fs, new Path(s"$dir/stale_$r"),
          new Path(s"$dir/claimed_${r}_$childId")))
        wins.append(s"claim $r\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, s"wins_$childId"), wins.toString)
  }
}
