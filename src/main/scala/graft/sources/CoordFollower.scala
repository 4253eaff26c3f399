package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}

/** A journal-tailing LIVE STANDBY for [[CoordServer]] — the third
  * deployment shape, between the two CrossProcessCoordSpec already
  * pins:
  *
  *  1. SHARED-JOURNAL promotion (zero acked loss): standby promotes
  *     from the SAME journal path — needs storage that survives the
  *     primary host.
  *  2. COPY-BASED promotion: one crash-consistent copy — every win
  *     acked AFTER the copy is lost; needs no shared storage but the
  *     loss window is "since the last copy".
  *  3. THIS: a follower that continuously re-captures the primary's
  *     journal into its OWN journal path while the primary runs, and
  *     promotes from that path on primary death. The loss window
  *     shrinks from "since the last copy" to "since the last poll"
  *     (tens of milliseconds), and closes COMPLETELY whenever the
  *     journal file is still readable at promotion time (primary
  *     PROCESS death, or its storage outliving the host) — the final
  *     [[promote]] drain captures the acked frontier exactly, because
  *     every ack rode an fsync that the post-mortem file contains.
  *     Under true host death with unreachable storage (no final
  *     drain), the follower alone preserves every win acked before its
  *     last completed poll: acked loss is BOUNDED BY THE TAIL LAG, not
  *     zero — zero there requires synchronous replication, which this
  *     deliberately is not (it costs nothing on the primary's commit
  *     path).
  *
  * Why naive file tailing is SAFE here: the CRC-prefix journal format
  * (see [[CoordServer.record]]) makes every read prefix-safe. A poll
  * racing the primary's appends sees a prefix of the journal plus at
  * most a partially-visible last record; a poll racing compaction sees
  * either the full history or the complete snapshot (the move is
  * atomic) — in every case the captured bytes are exactly the
  * crash-consistent shape [[CoordServer.start]]'s replay already
  * handles (torn-tail truncation). The follower never parses records
  * itself; it only guarantees its copy is byte-faithful and durable.
  *
  * The capture is a WHOLE-FILE copy per poll, not an offset-based
  * append tail: compaction REWRITES the journal (shrinking it), so an
  * offset tail would mis-splice across a rewrite, and the journal is
  * BOUNDED at ~4x live keys by online compaction — a full copy is
  * O(live keys), not O(history). Unchanged content is detected and
  * skipped, so a quiet primary costs one small read per poll.
  *
  * Measured envelope (`scale/follower_overhead.json`): tailing at
  * 20 ms costs the primary's commit path nothing measurable (the
  * follower holds no lock and forces nothing of the primary's — its
  * baseline-vs-tailed mut/s differences sit inside the host's disk
  * band, direction favoring neither), and promotion — final drain +
  * replay + startup force — lands in 8-38 ms on a churned journal,
  * O(live keys) because online compaction bounds the journal.
  *
  * Never run the promoted follower concurrently with a live primary
  * against one keyspace — same single-served rule as every other
  * shape ([[CoordServer]] scaladoc, failure posture).
  */
final class CoordFollower(
    primaryJournal: Path,
    followerJournal: Path,
    intervalMs: Long = 50L) {

  require(primaryJournal.toAbsolutePath != followerJournal.toAbsolutePath,
    "the follower must capture to its OWN journal path — for the " +
      "same-path shape use shared-journal promotion directly")

  @volatile private var stopped = false
  @volatile private var thread: Thread = null
  // last captured content, to skip rewriting an unchanged journal
  private var lastBytes: Array[Byte] = Array.emptyByteArray
  private var polls = 0L

  /** One capture: read the primary journal (prefix-consistent — see
    * class doc), and if it changed, publish it to the follower path via
    * write-temp, fsync, atomic-move, dir-fsync — the follower's copy
    * must itself be crash-consistent and durable, or a follower-host
    * power loss after promotion-decision time could revert the captured
    * frontier. Returns whether a capture (or no-change confirmation)
    * succeeded; a missing primary journal (not yet created) is a
    * successful no-op. */
  def pollOnce(): Boolean = synchronized {
    try {
      if (!Files.exists(primaryJournal)) return true
      val bytes = Files.readAllBytes(primaryJournal)
      if (java.util.Arrays.equals(bytes, lastBytes)) return true
      val tmp = followerJournal.resolveSibling(
        followerJournal.getFileName.toString + ".tail")
      val ch = FileChannel.open(tmp, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
      try {
        ch.write(java.nio.ByteBuffer.wrap(bytes))
        ch.force(true)
      } finally ch.close()
      // Clear any stale forced-frontier sidecar BEFORE publishing the
      // capture: a server previously promoted at this path left a
      // `<followerJournal>.fwm` describing ITS journal, and
      // CoordServer.start only removes the sidecar when the journal
      // file is missing — a fresh capture published next to the stale
      // frontier would have an unrelated bound clamped onto it, and a
      // legitimate capture-race torn tail at or below that bound would
      // refuse as media corruption, blocking the very promotion the
      // follower exists for. Deleting before the move keeps the crash
      // window safe: journal-without-sidecar falls back to the legacy
      // truncation rule, never to a wrong bound.
      Files.deleteIfExists(followerJournal.resolveSibling(
        followerJournal.getFileName.toString + ".fwm"))
      Files.move(tmp, followerJournal,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      if (followerJournal.toAbsolutePath.getParent != null)
        CoordServer.fsyncDir(followerJournal.toAbsolutePath.getParent)
      lastBytes = bytes
      polls += 1
      true
    } catch {
      case scala.util.control.NonFatal(e) =>
        // a failed poll only widens the lag window; the next poll (or
        // the promotion drain) retries from scratch
        System.err.println(s"[CoordFollower] poll failed (lag widens): $e")
        false
    }
  }

  /** Captures completed so far (diagnostic). */
  def capturedPolls: Long = synchronized(polls)

  /** Start the tail loop (daemon thread). */
  def start(): CoordFollower = {
    stopped = false
    val t = new Thread(() => {
      while (!stopped) {
        pollOnce()
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () }
      }
    }, "coord-follower")
    t.setDaemon(true)
    t.start()
    thread = t
    this
  }

  /** Stop the tail loop and wait for the in-flight poll to finish. */
  def stop(): Unit = {
    stopped = true
    val t = thread
    if (t != null) { t.interrupt(); t.join(5000) }
  }

  /** Promote: stop tailing, optionally drain the primary journal one
    * final time (the zero-acked-loss arm — do this whenever the file
    * is still readable after the primary died), and start a server on
    * the FOLLOWER's journal path. Replay handles whatever torn tail the
    * capture carries. */
  def promote(finalDrain: Boolean = true): CoordServer = {
    stop()
    if (finalDrain) pollOnce()
    CoordServer.start(followerJournal)
  }
}
