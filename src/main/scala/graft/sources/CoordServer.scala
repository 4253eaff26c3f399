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
  * Linearizability: every mutation executes under ONE lock, and its
  * journal record is written AND fsynced inside that lock before the
  * acknowledgement is sent — so an acknowledged win (a lease created, a
  * break-claim renamed) is both totally ordered against all other wins
  * and durable across a server crash. Reads take the same lock, so a
  * read observes every acknowledged mutation (no stale wins).
  *
  * Durability: an append-only journal of acknowledged mutations
  * (`P`/`R`/`D` records, URL-encoded operands), replayed on startup. A
  * crash after journal-write but before the ack re-applies the op
  * idempotently; a crash before journal-write loses an op that was
  * never acknowledged — exactly the at-most-once the caller already
  * handles (an unacknowledged createIfAbsent is a failed acquisition
  * and retries).
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
  * delete per op span; one stamp read per reopen) — thousands of ops/s
  * on one fsync-bound thread covers a warehouse of thousands of
  * concurrent writers. Nothing data-sized ever transits this channel.
  */
final class CoordServer private (
    val port: Int,
    server: ServerSocket,
    journal: FileChannel,
    kv: java.util.HashMap[String, String]) {

  private val lock = new Object
  @volatile private var closed = false

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def journalLine(line: String): Unit = {
    journal.write(java.nio.ByteBuffer.wrap((line + "\n").getBytes(UTF_8)))
    journal.force(false)
  }

  private[sources] def handle(cmd: String): String = {
    val parts = cmd.trim.split(" ", 3)
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    parts(0) match {
      case "PING" => "PONG"
      case "PIA" =>
        val (k, v) = (dec(parts(1)), dec(parts(2)))
        lock.synchronized {
          if (kv.containsKey(k)) "EXISTS"
          else {
            journalLine(s"P ${enc(k)} ${enc(v)}")
            kv.put(k, v); "OK"
          }
        }
      case "GET" =>
        val k = dec(parts(1))
        lock.synchronized {
          Option(kv.get(k)).map(v => s"VAL ${enc(v)}").getOrElse("NONE")
        }
      case "REN" =>
        val (s, d) = (dec(parts(1)), dec(parts(2)))
        lock.synchronized {
          val v = kv.get(s)
          if (v == null) "MISS"
          else {
            journalLine(s"R ${enc(s)} ${enc(d)}")
            kv.remove(s); kv.put(d, v); "OK"
          }
        }
      case "DEL" =>
        val k = dec(parts(1))
        lock.synchronized {
          if (!kv.containsKey(k)) "MISS"
          else {
            journalLine(s"D ${enc(k)}")
            kv.remove(k); "OK"
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
    try journal.close() catch { case _: java.io.IOException => () }
  }

  /** Test/diagnostic view of a key without a client connection. */
  private[graft] def peek(key: String): Option[String] =
    lock.synchronized(Option(kv.get(key)))
}

object CoordServer {

  /** Start a server on `port` (0 = ephemeral), recovering state from
    * `journalPath` when it exists (replay is idempotent: the journal
    * holds only acknowledged mutations, in ack order). */
  def start(journalPath: Path, port: Int = 0): CoordServer = {
    val kv = new java.util.HashMap[String, String]
    var journalLines = 0
    if (Files.exists(journalPath)) {
      def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
      Files.readAllLines(journalPath, UTF_8).forEach { line =>
        journalLines += 1
        val p = line.split(" ", 3)
        p(0) match {
          case "P" => kv.put(dec(p(1)), dec(p(2)))
          case "R" =>
            val v = kv.remove(dec(p(1))); if (v != null) kv.put(dec(p(2)), v)
          case "D" => kv.remove(dec(p(1)))
          case _ => () // torn trailing line from a crash mid-append:
          // the op was never acknowledged, dropping it is correct
        }
      }
    }
    // JOURNAL COMPACTION: leases and break-claims churn, so the journal
    // grows with op COUNT while the live keyspace stays lifecycle-sized
    // — replaying months of coordination history at every restart is
    // the classic unbounded-log failure. When history dwarfs state,
    // snapshot: rewrite the journal as one P-record per live key
    // (equivalent by construction — replay is a fold and the snapshot
    // is its current value), fsynced to a temp file then atomically
    // moved over the old journal, so a crash mid-compaction leaves
    // either the full history or the complete snapshot, never less.
    if (journalLines > math.max(64, 4 * kv.size)) {
      def enc(x: String) = java.net.URLEncoder.encode(x, "UTF-8")
      val tmp = journalPath.resolveSibling(journalPath.getFileName + ".snap")
      val ch = FileChannel.open(tmp, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
      try {
        val sb = new StringBuilder
        kv.forEach((k, v) => sb.append(s"P ${enc(k)} ${enc(v)}\n"))
        ch.write(java.nio.ByteBuffer.wrap(sb.toString.getBytes(UTF_8)))
        ch.force(true)
      } finally ch.close()
      Files.move(tmp, journalPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    if (journalPath.getParent != null) Files.createDirectories(journalPath.getParent)
    val journal = FileChannel.open(journalPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.APPEND)
    val server = new ServerSocket(port, 128,
      java.net.InetAddress.getLoopbackAddress)
    val cs = new CoordServer(server.getLocalPort, server, journal, kv)
    val t = new Thread(() => cs.serveLoop(), "coord-accept")
    t.setDaemon(true); t.start()
    cs
  }

  /** Standalone entry: `CoordServer <journalPath> <portFile>` — binds an
    * ephemeral loopback port, writes it to `portFile` (clients and the
    * spawning harness read it there), serves until killed. */
  def main(args: Array[String]): Unit = {
    val cs = start(java.nio.file.Paths.get(args(0)))
    Files.writeString(java.nio.file.Paths.get(args(1)), cs.port.toString)
    // park forever; the process is killed by its parent
    while (true) Thread.sleep(60000)
  }
}
