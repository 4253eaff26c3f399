package graft.sources

import java.net.{ServerSocket, Socket}
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}

/** A minimal DURABLE lock-service: the networked form of the
  * conditional-PUT / linearizable-map coordinator the
  * [[CommitCoordinator]] seam was designed for. One server process owns
  * the coordination keyspace (leases, break-claims, layout stamps);
  * any number of client processes connect over TCP and get
  * linearizable create-if-absent / read / rename / delete — the four
  * primitives every lease, fence, stamp and swap decision in
  * [[Catalog]] stands on. This is what an S3-shaped warehouse plugs in:
  * data directories stay on the (non-atomic) object store, exclusion
  * moves here.
  *
  * Linearizability: every mutation DECIDES and journals under ONE lock
  * (total order), and its acknowledgement is sent only after an fsync
  * whose coverage includes its record — so an acknowledged win (a lease
  * created, a break-claim renamed) is both totally ordered against all
  * other wins and durable across a server crash. Concurrent mutations
  * share one fsync (GROUP COMMIT: a leader forces the channel while
  * followers queue behind, so the per-fsync wall amortizes across
  * however many mutations queued — measured in
  * `scale/coord_throughput.json`). Reads take the same lock, so a read
  * observes every decided mutation; and ANY response whose decision
  * observed not-yet-durable state (a GET of a freshly created lease, a
  * loser's EXISTS against an unforced win) waits for that state's
  * durability before it is sent — no client can act on a state a crash
  * could un-happen.
  *
  * Durability: an append-only journal of acknowledged mutations
  * (`P`/`R`/`D` records, URL-encoded operands, each line prefixed with
  * a CRC32 of its body), replayed on startup. A crash after
  * journal-write but before the ack re-applies the op idempotently; a
  * crash before journal-write loses an op that was never acknowledged
  * — exactly the at-most-once the caller already handles (an
  * unacknowledged createIfAbsent is a failed acquisition and retries).
  * Under group commit a crash can leave SEVERAL staged-but-unforced
  * trailing records, and out-of-order page flush can tear a NON-final
  * one; the per-record checksum makes every tear detectable, and
  * because an fsync always covers a PREFIX of the file, a torn record
  * at position i proves no acknowledgement exists for any record >= i
  * — replay truncates there (see [[CoordServer.start]]). A record whose
  * checksum VERIFIES but whose body fails to parse is real corruption
  * of acknowledged state and still fails loudly. Truncation is further
  * BOUNDED by a forced-high-water sidecar (`<journal>.fwm`, rewritten
  * at every compaction and every ~[[CoordServer.FwmEvery]] forced
  * records): a CRC-failing record AT OR BELOW the recorded forced
  * frontier cannot be a crash tear — everything under the frontier was
  * fsynced — so it is media damage to ACKNOWLEDGED state and replay
  * refuses loudly instead of silently reverting every later acked win.
  * Above the frontier, truncation keeps a `.corrupt` copy of the
  * dropped bytes and reports how many intact-looking records followed
  * the tear, so a suspicious drop leaves evidence instead of erasing
  * it. Compaction's
  * atomic-move rename is followed by an fsync of the journal's parent
  * directory before any group-commit acknowledgement is released on
  * its strength — a rename alone is not durable, and acks must never
  * ride on a directory entry a power loss can revert.
  *
  * Protocol (UTF-8 lines; operands URL-encoded):
  * {{{
  *   PIA <key> <value>   -> OK | EXISTS          (put-if-absent)
  *   GET <key>           -> VAL <value> | NONE
  *   REN <src> <dst>     -> OK | MISS            (atomic remove+put)
  *   DEL <key>           -> OK | MISS
  *   PING                -> PONG
  * }}}
  *
  * Scale posture: coordination traffic is a handful of sub-100-byte
  * ops per LIFECYCLE OPERATION (one lease create + one read + one
  * delete per op span; one stamp read per reopen); the measured
  * envelope is in `scale/coord_throughput.json`
  * ([[graft.tools.CoordThroughput]], re-measured on the r19
  * CRC-journal format): ~2.3-3.2k mutations/s from one caller (the
  * per-op fsync wall — a solo mutation still pays one full force),
  * SCALING with concurrency under group commit to ~9.0k/s at 8
  * clients (each force amortizes across everything queued behind the
  * leader; before group commit the same probe measured the curve
  * DECLINING to ~2k/s at 16). The numbers are an envelope across
  * runs: fsync-bound throughput rides the host's disk windows (the
  * probe JSON records per-run spreads). The r20 forced-frontier
  * sidecar (one rename per ~64 forced records) does not bend the
  * curve: `scale/coord_throughput_r20.json`'s quiet-window run
  * replicates this envelope on the new format (solo 3492, 8-client
  * 8614). A lifecycle op span costs ~4
  * coordination ops and seconds of real work, so the measured ceiling
  * supports thousands of lifecycle ops per second — a warehouse of
  * thousands of concurrent writers — with headroom.
  * Nothing data-sized ever transits this channel. The journal is
  * BOUNDED at ~4x live keys by online compaction (see [[maybeCompact]]),
  * so uptime never grows replay time.
  *
  * Failure posture / recovery path: a server RESTART recovers from its
  * own journal (replay). Server LOSS recovers by STANDBY PROMOTION,
  * with two deployment shapes. (1) ZERO-ACKED-LOSS: the journal lives
  * on storage that survives the server host (shared/network storage),
  * and the standby promotes from the SAME journal path the dead
  * primary wrote — the acked frontier travels with the journal, so
  * every acknowledged win holds even when the primary is killed
  * mid-churn with no flush opportunity (CrossProcessCoordSpec
  * "shared-journal promotion"; replay's torn-tail truncation covers
  * whatever shape the kill left). (2) COPY-BASED: promote from the
  * most recent crash-consistent COPY of the journal — every win acked
  * BEFORE the copy holds; wins acked after it are lost, so this shape
  * trades acked-loss-after-copy for needing no shared storage
  * (CrossProcessCoordSpec "standby promotion"). Either way, never run
  * two servers against one keyspace concurrently — the journal has no
  * epoch fencing between simultaneous server instances; the
  * single-address client config is what keeps the keyspace
  * single-served.
  */
final class CoordServer private (
    val port: Int,
    server: ServerSocket,
    journalPath: Path,
    private var journal: FileChannel,
    kv: java.util.HashMap[String, String],
    private var journalLines: Long) {

  private val lock = new Object
  @volatile private var closed = false
  // group-commit bookkeeping, guarded by `lock`: records APPENDED to
  // the channel vs records known DURABLE, plus whether a leader is
  // currently inside force() (outside the lock, so appends keep queuing
  // behind it — that queue is exactly what the next force amortizes)
  private var writtenSeq = 0L
  private var forcedSeq = 0L
  private var forceLeader = false
  // forced-high-water sidecar bookkeeping, guarded by `lock`: the
  // record count the on-disk `<journal>.fwm` covers, and a generation
  // counter that invalidates a leader's captured count when a
  // compaction rewrote (and renumbered) the journal under it
  private var fwmRecords = journalLines
  private var compactGen = 0L

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Append a journal record WITHOUT forcing; returns the record's
    * sequence for [[awaitDurable]]. Caller holds `lock`. The body is
    * written as a checksummed line ([[CoordServer.record]]) so a torn
    * or partially-flushed append is detectable on replay. */
  private def stage(body: String): Unit = {
    journal.write(java.nio.ByteBuffer.wrap(
      (CoordServer.record(body) + "\n").getBytes(UTF_8)))
    journalLines += 1
    writtenSeq += 1
  }

  /** Block until every record up to `seq` is durable. The first waiter
    * becomes the force LEADER: it captures the current append high-water
    * mark and runs force() OUTSIDE the lock (FileChannel appends are
    * thread-safe, so new mutations keep staging behind it); every
    * follower that queued meanwhile is covered by the leader's force or
    * becomes the next leader. Online compaction counts as a force (its
    * snapshot is fsynced then atomically moved, making every staged
    * record durable), so it simply advances `forcedSeq` and wakes
    * waiters. */
  private def awaitDurable(seq: Long): Unit = {
    var target = 0L
    var targetRecords = 0L
    var gen = 0L
    lock.synchronized {
      while (forcedSeq < seq && forceLeader && !closed) lock.wait()
      if (closed && forcedSeq < seq)
        throw new java.io.IOException("coord server closed before fsync")
      if (forcedSeq >= seq) return
      forceLeader = true
      target = writtenSeq
      targetRecords = journalLines
      gen = compactGen
    }
    try journal.force(false)
    catch {
      case e: java.io.IOException =>
        lock.synchronized { forceLeader = false; lock.notifyAll() }
        throw e
    }
    lock.synchronized {
      forcedSeq = math.max(forcedSeq, target)
      forceLeader = false
      // advance the forced-high-water sidecar every ~FwmEvery forced
      // records (compaction rewrites it exactly; skip when one renumbered
      // the journal under this force). The write is best-effort: a failed
      // or stale sidecar only WEAKENS the corruption/tear distinction back
      // toward the legacy truncate-everything rule — never the ack.
      if (gen == compactGen && targetRecords - fwmRecords >= CoordServer.FwmEvery) {
        try {
          CoordServer.writeFwm(journalPath, targetRecords)
          fwmRecords = targetRecords
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[CoordServer] fwm sidecar write failed " +
              s"(truncation bound stays at $fwmRecords): $e")
        }
      }
      lock.notifyAll()
    }
  }

  /** ONLINE compaction check (same trigger as startup): leases and
    * break-claims churn, so without this a server up for months grows
    * its journal without bound — precisely the long-uptime regime a
    * lock service exists for. Called AFTER the map mutation the journal
    * record describes (the snapshot is rewritten FROM the map, so
    * compacting between journal-append and map-update would silently
    * drop that record). Runs under the mutation lock (the caller holds
    * it), so the snapshot is a consistent point and no mutation
    * interleaves; cost is one live-keyspace rewrite, and the keyspace
    * is lifecycle-sized (a handful of leases/stamps), so the pause is
    * microseconds, not a stall. */
  private def maybeCompact(): Unit =
    if (journalLines > math.max(64L, 4L * kv.size) && !forceLeader)
      compactLocked()
    // a leader mid-force holds the channel outside the lock — skip this
    // trigger; churn re-fires it on the next mutation

  /** Snapshot-then-atomic-move compaction; caller holds `lock`. A crash
    * anywhere leaves either the full history or the complete snapshot
    * (the move is atomic), never less — identical to the startup path.
    * A FAILURE anywhere in the close-move-fsync-reopen sequence fails
    * the whole server loudly instead of leaving it a zombie: the live
    * channel was already closed, so surviving the exception would mean
    * serving reads from memory while every later mutation dies on a
    * closed channel. */
  private def compactLocked(): Unit = {
    try {
      CoordServer.writeSnapshot(journalPath, kv)
      journal.close()
      val tmp = journalPath.resolveSibling(journalPath.getFileName.toString + ".snap")
      Files.move(tmp, journalPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      // the rename is atomic but NOT durable until the directory entry
      // itself is on disk — group-commit acks are about to be released on
      // the strength of this snapshot, so fsync the parent directory
      // BEFORE advancing forcedSeq; a power loss must not revert the
      // directory to the old journal whose staged tail was only in page
      // cache
      CoordServer.fsyncDir(journalPath.toAbsolutePath.getParent)
      journal = FileChannel.open(journalPath, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.APPEND)
      journalLines = kv.size.toLong
      compactGen += 1
      // the snapshot IS the forced frontier now: rewrite the sidecar so
      // the refusal bound covers the whole renumbered journal (pinned
      // before any later append can ride on it — the lock is held
      // through this call, so no record can interleave)
      try {
        CoordServer.writeFwm(journalPath, kv.size.toLong)
        CoordServer.fsyncDir(journalPath.toAbsolutePath.getParent)
        fwmRecords = kv.size.toLong
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[CoordServer] fwm sidecar write failed " +
            s"after compaction (bound falls back to clamping): $e")
      }
    } catch {
      case t: Throwable if !t.isInstanceOf[scala.util.control.ControlThrowable] =>
        System.err.println(
          "[CoordServer] FATAL: compaction failed mid close-move-reopen — " +
            s"failing the server rather than serving as a zombie: $t")
        closed = true
        try server.close() catch { case _: java.io.IOException => () }
        try journal.close() catch { case _: Exception => () }
        lock.notifyAll()
        throw new java.io.IOException("coord server failed during compaction", t)
    }
    // the snapshot was fsynced and atomically+durably moved, so every
    // record staged so far is durable THROUGH it — satisfy any
    // group-commit waiters without a second force
    forcedSeq = writtenSeq
    lock.notifyAll()
  }

  /** Test/diagnostic: current journal size in records (replayed history
    * plus appends since the last compaction). */
  private[graft] def journalRecords: Long = lock.synchronized(journalLines)

  /** Decide under the lock, then wait until everything the decision
    * OBSERVED is durable before letting the response out — including
    * pure reads and refusals (a GET of a freshly created lease, a
    * loser's EXISTS against an unforced win must not outrun the crash
    * durability of what they saw). On a quiet channel the wait is a
    * no-op (`forcedSeq` already covers the observation). */
  private def decided(body: => String): String = {
    val (resp, observed) = lock.synchronized { (body, writtenSeq) }
    awaitDurable(observed)
    resp
  }

  private[sources] def handle(cmd: String): String = {
    val parts = cmd.trim.split(" ", 3)
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    parts(0) match {
      case "PING" => "PONG"
      case "PIA" =>
        val (k, v) = (dec(parts(1)), dec(parts(2)))
        decided {
          if (kv.containsKey(k)) "EXISTS"
          else {
            stage(s"P ${enc(k)} ${enc(v)}")
            kv.put(k, v); maybeCompact(); "OK"
          }
        }
      case "GET" =>
        val k = dec(parts(1))
        decided {
          Option(kv.get(k)).map(v => s"VAL ${enc(v)}").getOrElse("NONE")
        }
      case "REN" =>
        val (s, d) = (dec(parts(1)), dec(parts(2)))
        decided {
          val v = kv.get(s)
          if (v == null) "MISS"
          else {
            stage(s"R ${enc(s)} ${enc(d)}")
            kv.remove(s); kv.put(d, v); maybeCompact(); "OK"
          }
        }
      case "DEL" =>
        val k = dec(parts(1))
        decided {
          if (!kv.containsKey(k)) "MISS"
          else {
            stage(s"D ${enc(k)}")
            kv.remove(k); maybeCompact(); "OK"
          }
        }
      case other => s"ERR unknown command $other"
    }
  }

  private def serveLoop(): Unit = {
    while (!closed) {
      val s =
        try server.accept()
        catch { case _: java.io.IOException => null } // closed
      if (s != null) {
        val t = new Thread(() => serveConn(s), "coord-conn")
        t.setDaemon(true); t.start()
      }
    }
  }

  private def serveConn(s: Socket): Unit = {
    try {
      s.setTcpNoDelay(true)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, UTF_8))
      val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, UTF_8))
      var line = in.readLine()
      while (line != null) {
        out.write(handle(line)); out.write("\n"); out.flush()
        line = in.readLine()
      }
    } catch {
      case _: java.io.IOException => () // client went away
    } finally {
      try s.close() catch { case _: java.io.IOException => () }
    }
  }

  /** Stop accepting and release the journal. In-flight connections die
    * with their sockets; acknowledged state is on disk. */
  def close(): Unit = {
    closed = true
    try server.close() catch { case _: java.io.IOException => () }
    // under the mutation lock: an in-flight op (or online compaction)
    // finishes against an open channel before it is released; queued
    // group-commit waiters are woken to fail loudly instead of parking
    // forever on a channel that will never force again
    lock.synchronized {
      try journal.close() catch { case _: java.io.IOException => () }
      lock.notifyAll()
    }
  }

  /** Test/diagnostic view of a key without a client connection. */
  private[graft] def peek(key: String): Option[String] =
    lock.synchronized(Option(kv.get(key)))
}

object CoordServer {

  private def crcHex(body: String): String = {
    val c = new java.util.zip.CRC32
    c.update(body.getBytes(UTF_8))
    java.lang.Long.toHexString(c.getValue)
  }

  /** Journal line for `body`: a CRC32 PREFIX (`#<crc> <body>`) makes a
    * torn or partially-flushed record detectable on replay. The
    * checksum leads rather than trails so a tear that eats trailing
    * bytes can never leave a line that accidentally parses as a
    * shorter record with a truncated value — a damaged line either
    * fails its checksum or (legacy, no `#`) fails to parse. */
  private[sources] def record(body: String): String = s"#${crcHex(body)} $body"

  /** Rewrite the forced-high-water sidecar this often (in forced
    * records). The sidecar bounds replay's torn-tail truncation: an
    * invalid record at or below it is media corruption of acknowledged
    * state (refuse loudly), above it a legitimate unforced tear
    * (truncate). Smaller = tighter bound, one extra rename+dir-fsync
    * per interval. */
  private[sources] val FwmEvery = 64L

  private def fwmPath(journalPath: Path): Path =
    journalPath.resolveSibling(journalPath.getFileName.toString + ".fwm")

  /** Publish the forced frontier (`count` journal records known
    * durable) to `<journal>.fwm`: one checksummed line, temp +
    * atomic-move. No file fsync is needed for SAFETY — the journal
    * prefix it names was forced before this is called, and a torn or
    * reverted sidecar only weakens the bound (CRC-invalid => ignored,
    * stale => smaller count => more truncation allowed, exactly the
    * legacy behavior); callers that want the bound pinned across power
    * loss follow with [[fsyncDir]]. */
  private[sources] def writeFwm(journalPath: Path, count: Long): Unit = {
    val p = fwmPath(journalPath)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, record(s"F $count") + "\n")
    Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The recorded forced frontier for `journalPath`, or 0 when the
    * sidecar is missing, torn (CRC fails), or malformed — all of which
    * fall back to the legacy truncate-any-suffix rule rather than
    * refusing anything. */
  private[sources] def readFwm(journalPath: Path): Long = {
    val p = fwmPath(journalPath)
    if (!Files.exists(p)) return 0L
    try {
      val line = Files.readString(p, UTF_8).trim
      val sp = line.indexOf(' ')
      if (!line.startsWith("#") || sp <= 1 ||
          line.substring(1, sp) != crcHex(line.substring(sp + 1))) 0L
      else {
        val body = line.substring(sp + 1).split(" ", 2)
        if (body.length == 2 && body(0) == "F") body(1).toLong else 0L
      }
    } catch { case scala.util.control.NonFatal(_) => 0L }
  }

  /** fsync a DIRECTORY so a just-completed rename of a child entry is
    * durable — ATOMIC_MOVE orders the swap but only a directory fsync
    * pins it across power loss. */
  private[sources] def fsyncDir(dir: Path): Unit = {
    val ch = FileChannel.open(dir, StandardOpenOption.READ)
    try ch.force(true) finally ch.close()
  }

  /** Write the live keyspace as a checksummed snapshot to
    * `<journal>.snap`, fsynced. The caller moves it over the journal. */
  private[sources] def writeSnapshot(
      journalPath: Path, kv: java.util.HashMap[String, String]): Unit = {
    def enc(x: String) = java.net.URLEncoder.encode(x, "UTF-8")
    val tmp = journalPath.resolveSibling(journalPath.getFileName.toString + ".snap")
    val ch = FileChannel.open(tmp, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      val sb = new StringBuilder
      kv.forEach((k, v) => sb.append(record(s"P ${enc(k)} ${enc(v)}")).append('\n'))
      ch.write(java.nio.ByteBuffer.wrap(sb.toString.getBytes(UTF_8)))
      ch.force(true)
    } finally ch.close()
  }

  /** Start a server on `port` (0 = ephemeral), recovering state from
    * `journalPath` when it exists (replay is idempotent: the journal
    * holds only acknowledged mutations, in ack order). */
  def start(journalPath: Path, port: Int = 0): CoordServer = {
    val kv = new java.util.HashMap[String, String]
    var journalLines = 0
    var tornTail = false
    var droppedLines: Seq[String] = Nil
    if (!Files.exists(journalPath)) {
      // a sidecar with no journal is a leftover from a previous
      // incarnation at this path — it must not bound a fresh journal
      try Files.deleteIfExists(fwmPath(journalPath))
      catch { case scala.util.control.NonFatal(_) => () }
    } else {
      def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
      val lines = Files.readAllLines(journalPath, UTF_8)
      // the forced frontier the sidecar recorded, clamped to the file
      // (a compaction can shrink the journal under a stale-high
      // sidecar; everything in a post-compaction journal was fsynced,
      // so clamping errs toward refusing — the loud direction)
      val fwmCount = math.min(readFwm(journalPath), lines.size.toLong)
      // Replay discipline. Checksummed (`#`-prefixed) records: a line
      // whose CRC VERIFIES was fully written by this code, so a
      // malformed body under a verifying checksum is real corruption of
      // acknowledged state — fail loudly. A `#` line whose CRC does NOT
      // verify is a torn record; because every fsync covers a PREFIX of
      // the file, a torn record at position i proves no force — hence
      // no acknowledgement — ever covered any record >= i (group commit
      // can leave SEVERAL unforced trailing records, and out-of-order
      // page flush can tear a NON-final one): truncate there, dropping
      // the unacknowledged tail. The same truncation applies to any
      // unparseable line once a checksummed record has been seen (tail
      // garbage from a partial page flush need not keep the `#`).
      // Legacy journals (no checksummed records, written under
      // fsync-per-record) keep the original rule: only the FINAL record
      // can tear; an interior malformation is corruption and refuses.
      // Either way, an invalid record AT OR BELOW the forced frontier
      // (`fwmCount`) cannot be a crash tear — that prefix was fsynced —
      // so it refuses as media corruption of acknowledged state.
      def refuseForced(i: Int, line: String): Nothing =
        throw new java.io.IOException(
          s"corrupt journal record at line $i of ${lines.size} " +
            s"('${line.take(80)}') BELOW the forced frontier " +
            s"($fwmCount records fsynced per ${fwmPath(journalPath).getFileName}) " +
            "— this is damage to acknowledged state, not an unforced " +
            "tear; refusing to silently revert later acked records")
      var sawChecked = false
      var i = 0
      while (i < lines.size && !tornTail) {
        val line = lines.get(i)
        i += 1
        val checked = line.startsWith("#")
        val sp = if (checked) line.indexOf(' ') else -1
        val body =
          if (!checked) line
          else if (sp > 1 && line.substring(1, sp) == crcHex(line.substring(sp + 1)))
            line.substring(sp + 1)
          else null // torn checksummed record
        if (body == null) {
          if (i <= fwmCount) refuseForced(i, line)
          tornTail = true
        } else {
          try {
            val p = body.split(" ", 3)
            p(0) match {
              case "P" => kv.put(dec(p(1)), dec(p(2)))
              case "R" =>
                val v = kv.remove(dec(p(1))); if (v != null) kv.put(dec(p(2)), v)
              case "D" => kv.remove(dec(p(1)))
              case other =>
                throw new java.io.IOException(s"unknown record type '$other'")
            }
            journalLines += 1
            if (checked) sawChecked = true
          } catch {
            case e: Exception if checked =>
              throw new java.io.IOException(
                s"corrupt journal record at line $i of ${lines.size} " +
                  s"('${line.take(80)}'): body malformed under a VERIFYING " +
                  "checksum — this is damage to acknowledged state, not a " +
                  "torn append; refusing to replay a partial state", e)
            case _: Exception if (sawChecked || i == lines.size) && i > fwmCount =>
              tornTail = true // unacknowledged torn tail: dropped
            case e: Exception if i <= fwmCount =>
              throw new java.io.IOException(
                s"corrupt journal record at line $i of ${lines.size} " +
                  s"('${line.take(80)}') BELOW the forced frontier " +
                  s"($fwmCount records fsynced) — refusing to replay a " +
                  "partial state", e)
            case e: Exception =>
              throw new java.io.IOException(
                s"corrupt INTERIOR journal record at line $i of " +
                  s"${lines.size} ('${line.take(80)}') — refusing to replay " +
                  "a partial state; inspect the journal", e)
          }
        }
      }
      if (tornTail) {
        import scala.jdk.CollectionConverters._
        droppedLines = lines.subList(journalLines, lines.size).asScala.toSeq
        // how many of the dropped records LOOK intact (CRC verifies):
        // a true crash tear is usually followed by garbage; a run of
        // intact-looking records after the tear smells like interior
        // damage to an old record that the fwm interval didn't yet
        // cover — the operator gets the count and the bytes, not a
        // silent erase
        val intactAfter = droppedLines.drop(1).count { l =>
          val sp = l.indexOf(' ')
          l.startsWith("#") && sp > 1 &&
            l.substring(1, sp) == crcHex(l.substring(sp + 1))
        }
        System.err.println(s"[CoordServer] journal ${journalPath.getFileName}: " +
          s"dropped ${droppedLines.size} torn/unforced trailing record(s) " +
          s"(never acknowledged; $intactAfter intact-looking after the tear" +
          (if (intactAfter > 0) " -- if the first invalid record was OLD " +
            "acknowledged state rather than a crash tear, recover from " +
            s"${journalPath.getFileName}.corrupt" else "") +
          s"); replayed $journalLines")
      }
    }
    // STARTUP JOURNAL COMPACTION: leases and break-claims churn, so the
    // journal grows with op COUNT while the live keyspace stays
    // lifecycle-sized — replaying months of coordination history at
    // every restart is the classic unbounded-log failure. When history
    // dwarfs state, snapshot: rewrite the journal as one P-record per
    // live key (equivalent by construction — replay is a fold and the
    // snapshot is its current value), fsynced to a temp file then
    // atomically moved over the old journal, so a crash mid-compaction
    // leaves either the full history or the complete snapshot, never
    // less. The same trigger also fires ONLINE (see maybeCompact /
    // compactLocked), so a long-lived server bounds its journal at
    // ~4x live keys without ever restarting. A torn tail also forces
    // the rewrite, scrubbing the dropped garbage from disk so the next
    // replay starts from a clean checksummed snapshot.
    if (tornTail || journalLines > math.max(64, 4 * kv.size)) {
      // keep the dropped bytes before the scrub erases them — the
      // truncation decision is sound for crash tears, but the evidence
      // must survive for the shapes it cannot distinguish
      if (droppedLines.nonEmpty)
        try Files.writeString(
          journalPath.resolveSibling(journalPath.getFileName.toString + ".corrupt"),
          droppedLines.mkString("", "\n", "\n"))
        catch { case scala.util.control.NonFatal(_) => () }
      writeSnapshot(journalPath, kv)
      val tmp = journalPath.resolveSibling(journalPath.getFileName.toString + ".snap")
      Files.move(tmp, journalPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      if (journalPath.toAbsolutePath.getParent != null)
        fsyncDir(journalPath.toAbsolutePath.getParent)
      journalLines = kv.size
    }
    if (journalPath.getParent != null) Files.createDirectories(journalPath.getParent)
    val journal = FileChannel.open(journalPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.APPEND)
    // startup frontier: one fsync pins every replayed record (they were
    // READ from the file, but a process-kill-then-power-loss could still
    // revert unforced pages), after which the sidecar may name the whole
    // journal as the refusal bound. Best-effort like every fwm write.
    if (journalLines > 0)
      try {
        journal.force(true)
        writeFwm(journalPath, journalLines.toLong)
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[CoordServer] startup fwm write failed " +
            s"(truncation bound falls back to the prior sidecar): $e")
      }
    val server = new ServerSocket(port, 128,
      java.net.InetAddress.getLoopbackAddress)
    val cs = new CoordServer(server.getLocalPort, server, journalPath,
      journal, kv, journalLines.toLong)
    val t = new Thread(() => cs.serveLoop(), "coord-accept")
    t.setDaemon(true); t.start()
    cs
  }

  /** Standalone entry: `CoordServer <journalPath> <portFile>` — binds an
    * ephemeral loopback port, writes it to `portFile` (clients and the
    * spawning harness read it there), serves until killed. */
  def main(args: Array[String]): Unit = {
    val cs = start(java.nio.file.Paths.get(args(0)))
    // atomic publish: a watcher polling the portfile must never observe
    // it existing but empty (created-then-written is two visible states)
    val pf = java.nio.file.Paths.get(args(1))
    val tmp = pf.resolveSibling(pf.getFileName.toString + ".tmp")
    Files.writeString(tmp, cs.port.toString)
    // REPLACE_EXISTING alongside ATOMIC_MOVE: POSIX rename() replaces
    // silently either way, but a provider that cannot guarantee atomic
    // replace must not kill a freshly bound server over a stale
    // portfile from a prior run
    Files.move(tmp, pf, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // park forever; the process is killed by its parent
    while (true) Thread.sleep(60000)
  }
}
