package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import graft.sources.{CommitCoordinator, CoordServer}

/** The cross-process proof for the DURABLE REMOTE coordinator
  * ([[CoordServer]] + [[CommitCoordinator.remote]]): the strongest
  * claim in the coordination story — "an object-store deployment plugs
  * in a conditional-PUT / lock-service coordinator and every exclusion
  * decision inherits the guarantee" — held only for in-process
  * reference impls until now. Here K real child JVMs
  * ([[graft.tools.CoordRaceChild]]) race lease creation and the
  * stale-lease break-claim THROUGH ONE SERVER PROCESS's linearizable
  * map, and the invariants are the same ones CrossProcessLeaseSpec
  * pins for POSIX O_EXCL: exactly one winner per round, no exceptions,
  * over hundreds of contended rounds. Plus the property O_EXCL cannot
  * give: the server's state survives a full stop/restart (journal
  * replay), so an acknowledged win is never un-won by a coordinator
  * crash.
  */
class CrossProcessCoordSpec extends AnyFunSuite {

  private def repoRoot: java.nio.file.Path = {
    var d = Paths.get("").toAbsolutePath
    while (d != null && !Files.exists(d.resolve("build.sbt"))) d = d.getParent
    require(d != null, "repo root not found"); d
  }

  test("K child JVMs race the remote coordinator: one winner per round, state survives restart") {
    val dir = Files.createTempDirectory("graft-xproc-coord").toString
    val journal = Paths.get(dir, "coord.journal")
    val server = CoordServer.start(journal)
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val client = CommitCoordinator.remote("127.0.0.1", server.port)
    val rounds = 300
    val kids = 4
    try {
      // seed the stale leases IN THE SERVER — the claim race must be
      // decided by the server's atomic remove+put, not the filesystem
      (0 until rounds).foreach { r =>
        assert(client.createIfAbsent(fs, new HPath(s"$dir/stale_$r"), "dead 0"))
      }
      val cp = repoRoot.resolve("target/scala-2.13/classes").toString +
        ":/opt/spark/jars/*"
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val procs = (0 until kids).map { k =>
        new ProcessBuilder(javaBin, "-cp", cp, "-Xmx512m",
          "graft.tools.CoordRaceChild", dir, s"child$k", rounds.toString,
          server.port.toString)
          .redirectErrorStream(true)
          .redirectOutput(new java.io.File(s"$dir/out_child$k"))
          .start()
      }
      // release only when every child JVM reports booted — otherwise the
      // first-booted child sweeps the rounds before its siblings exist
      val readyDeadline = System.currentTimeMillis() + 60000
      while ((0 until kids).exists(k => !Files.exists(Paths.get(dir, s"ready_child$k")))
             && System.currentTimeMillis() < readyDeadline) Thread.sleep(5)
      assert((0 until kids).forall(k => Files.exists(Paths.get(dir, s"ready_child$k"))),
        "not every child JVM became ready in time")
      Files.writeString(Paths.get(dir, "go"), "") // release the barrier
      procs.foreach { p =>
        assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
          "child JVM did not finish")
        assert(p.exitValue() === 0, "child JVM crashed")
      }
      val winsByChild: Map[String, Seq[String]] = (0 until kids).map { k =>
        val f = Paths.get(dir, s"wins_child$k")
        s"child$k" -> (if (Files.exists(f))
          Files.readString(f).linesIterator.filter(_.nonEmpty).toSeq
        else Seq.empty)
      }.toMap
      // exactly one CREATE winner per round; the SERVER's lease content
      // names that winner; nothing ever touched the filesystem
      val createWinners: Map[Int, Seq[String]] = winsByChild.toSeq
        .flatMap { case (kid, ws) =>
          ws.collect { case s if s.startsWith("create ") =>
            s.stripPrefix("create ").toInt -> kid }
        }.groupMap(_._1)(_._2)
      assert(createWinners.size === rounds, "some round had NO create winner")
      val doubleCreates = createWinners.filter(_._2.size > 1)
      assert(doubleCreates.isEmpty,
        s"non-linearizable put-if-absent: rounds ${doubleCreates.keys.take(5)} " +
          "were won by multiple processes")
      createWinners.foreach { case (r, Seq(kid)) =>
        assert(client.readSmall(fs, new HPath(s"$dir/round_${r}__lease"))
          .contains(kid), s"round $r server lease content != sole winner")
        assert(!Files.exists(Paths.get(dir, s"round_${r}__lease")),
          s"round $r lease leaked to the filesystem")
      }
      // exactly one CLAIM winner per stale key; the claim landed in the
      // server under the winner's unique path and the stale key is gone
      val claimWinners: Map[Int, Seq[String]] = winsByChild.toSeq
        .flatMap { case (kid, ws) =>
          ws.collect { case s if s.startsWith("claim ") =>
            s.stripPrefix("claim ").toInt -> kid }
        }.groupMap(_._1)(_._2)
      assert(claimWinners.size === rounds, "some stale lease was never claimed")
      val doubleClaims = claimWinners.filter(_._2.size > 1)
      assert(doubleClaims.isEmpty,
        s"non-atomic remove+put: rounds ${doubleClaims.keys.take(5)}")
      claimWinners.foreach { case (r, Seq(kid)) =>
        assert(client.readSmall(fs,
          new HPath(s"$dir/claimed_${r}_$kid")).contains("dead 0"))
        assert(client.readSmall(fs, new HPath(s"$dir/stale_$r")).isEmpty,
          s"stale_$r survived its claim")
      }
      val distinctCreateWinners = createWinners.values.flatten.toSet
      assert(distinctCreateWinners.size >= 2,
        s"only ${distinctCreateWinners} ever won — race never contended")

      // DURABILITY: stop the server, restart from the journal on a new
      // port — every acknowledged win must still be there, verbatim
      server.close()
      val revived = CoordServer.start(journal)
      try {
        val client2 = CommitCoordinator.remote("127.0.0.1", revived.port)
        createWinners.foreach { case (r, Seq(kid)) =>
          assert(client2.readSmall(fs, new HPath(s"$dir/round_${r}__lease"))
            .contains(kid), s"round $r lease lost across restart")
        }
        claimWinners.foreach { case (r, Seq(kid)) =>
          assert(client2.readSmall(fs,
            new HPath(s"$dir/claimed_${r}_$kid")).contains("dead 0"),
            s"claim $r lost across restart")
          assert(client2.readSmall(fs, new HPath(s"$dir/stale_$r")).isEmpty,
            s"stale_$r resurrected by replay")
        }
        // and a new acquisition still refuses over recovered state
        assert(!client2.createIfAbsent(fs,
          new HPath(s"$dir/round_0__lease"), "usurper"))
      } finally revived.close()
    } finally server.close()
  }

  test("the standalone server main serves a separate-process deployment") {
    // the deployment entry (`CoordServer <journal> <portFile>`): a real
    // child JVM runs the server, the parent discovers the port through
    // the portfile handshake, coordinates through it, kills it, and the
    // acknowledged state is recovered by a fresh start on the journal
    val dir = Files.createTempDirectory("graft-coord-main").toString
    val journal = Paths.get(dir, "coord.journal")
    val portFile = Paths.get(dir, "port")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val cp = repoRoot.resolve("target/scala-2.13/classes").toString +
      ":/opt/spark/jars/*"
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val proc = new ProcessBuilder(javaBin, "-cp", cp, "-Xmx256m",
      "graft.sources.CoordServer", journal.toString, portFile.toString)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$dir/server.log"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def portNow(): Option[Int] =
        if (!Files.exists(portFile)) None
        else Files.readString(portFile).trim.toIntOption
      while (portNow().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      val port = portNow().getOrElse(fail("server never published its port"))
      val c = CommitCoordinator.remote("127.0.0.1", port)
      assert(c.createIfAbsent(fs, new HPath(s"$dir/k"), "v across processes"))
      assert(!c.createIfAbsent(fs, new HPath(s"$dir/k"), "usurper"))
      assert(c.readSmall(fs, new HPath(s"$dir/k")).contains("v across processes"))
    } finally { proc.destroy(); proc.waitFor(10, TimeUnit.SECONDS) }
    // the killed server's acknowledged state recovers from the journal
    val revived = CoordServer.start(journal)
    try {
      val c2 = CommitCoordinator.remote("127.0.0.1", revived.port)
      assert(c2.readSmall(fs, new HPath(s"$dir/k")).contains("v across processes"))
    } finally revived.close()
  }

  test("ONLINE compaction bounds the journal across a 10x churn run without restart") {
    // lease churn grows the journal with op COUNT while the keyspace
    // stays lifecycle-sized — and a lock service's normal deployment is
    // MONTHS of uptime, so waiting for a restart to snapshot is the
    // classic unbounded-log failure. The same >4x-live trigger now
    // fires DURING operation (under the mutation lock): the journal
    // must stay bounded across a churn run that is 10x past the
    // trigger, with no restart, and a crash+restart afterwards must
    // recover the full acknowledged state.
    val dir = Files.createTempDirectory("graft-coord-online").toString
    val journal = Paths.get(dir, "coord.journal")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val s1 = CoordServer.start(journal)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s1.port)
      (0 until 3).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/stamp_$i"), s"layout $i"))
      }
      // 650 acquire/release cycles = 1300+ mutations, 10x past the
      // 64-record trigger, while live keys stay at 3-4
      var maxRecords = 0L
      (0 until 650).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/lease"), s"h$i"))
        assert(c.delete(fs, new HPath(s"$dir/lease"), false))
        if (i % 10 == 0) maxRecords = math.max(maxRecords, s1.journalRecords)
      }
      maxRecords = math.max(maxRecords, s1.journalRecords)
      // bounded at the trigger (max(64, 4*live)+1), not growing with
      // the 1300-op history
      assert(maxRecords <= 70,
        s"journal reached $maxRecords records mid-uptime — online " +
          "compaction never fired or fired too late")
      assert(Files.readAllLines(journal).size <= 70)
      // state is intact through the online snapshots, no restart needed
      (0 until 3).foreach { i =>
        assert(c.readSmall(fs, new HPath(s"$dir/stamp_$i"))
          .contains(s"layout $i"))
      }
      // survives the compactions' channel swaps: a fresh mutation lands
      assert(c.createIfAbsent(fs, new HPath(s"$dir/extra"), "x"))
    } finally s1.close()
    // crash + restart: the compacted journal replays the full state
    val s2 = CoordServer.start(journal)
    try {
      val c2 = CommitCoordinator.remote("127.0.0.1", s2.port)
      (0 until 3).foreach { i =>
        assert(c2.readSmall(fs, new HPath(s"$dir/stamp_$i"))
          .contains(s"layout $i"))
      }
      assert(c2.readSmall(fs, new HPath(s"$dir/extra")).contains("x"))
      assert(c2.readSmall(fs, new HPath(s"$dir/lease")).isEmpty,
        "released lease resurrected by replay")
    } finally s2.close()
  }

  test("startup compaction still snapshots a legacy oversized journal") {
    // a journal written by a pre-online-compaction server (or copied
    // from one) can arrive oversized; the startup path snapshots it
    // before serving
    val dir = Files.createTempDirectory("graft-coord-legacy").toString
    val journal = Paths.get(dir, "coord.journal")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val sb = new StringBuilder
    (0 until 300).foreach { i => sb.append(s"P lease h$i\n"); sb.append("D lease\n") }
    (0 until 3).foreach { i => sb.append(s"P stamp_$i layout+$i\n") }
    Files.writeString(journal, sb.toString)
    val s = CoordServer.start(journal)
    try {
      assert(Files.readAllLines(journal).size === 3)
      val c = CommitCoordinator.remote("127.0.0.1", s.port)
      (0 until 3).foreach { i =>
        assert(c.readSmall(fs, new HPath(s"stamp_$i")).contains(s"layout $i"))
      }
    } finally s.close()
  }

  test("replay drops a torn TRAILING record and refuses a corrupt INTERIOR one") {
    // a crash mid-append tears exactly the final record — 'P key' with
    // no value, or a %-escape cut mid-value. That op was never
    // acknowledged (the ack follows the fsync), so dropping it is
    // correct; the same malformation INSIDE the journal is real
    // corruption and must fail loudly, not silently resurrect a
    // partial state.
    val dir = Files.createTempDirectory("graft-coord-torn").toString
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())

    // torn value field (missing operand)
    val j1 = Paths.get(dir, "j1")
    Files.writeString(j1, "P k1 v1\nP k2")
    val s1 = CoordServer.start(j1)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s1.port)
      assert(c.readSmall(fs, new HPath("k1")).contains("v1"))
      assert(c.readSmall(fs, new HPath("k2")).isEmpty, "torn record applied")
      // the server still serves and journals after the drop
      assert(c.createIfAbsent(fs, new HPath("k3"), "v3"))
    } finally s1.close()

    // torn %-escape (URLDecoder would throw)
    val j2 = Paths.get(dir, "j2")
    Files.writeString(j2, "P k1 v1\nP k2 broken%2")
    val s2 = CoordServer.start(j2)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s2.port)
      assert(c.readSmall(fs, new HPath("k1")).contains("v1"))
      assert(c.readSmall(fs, new HPath("k2")).isEmpty)
    } finally s2.close()

    // the SAME tear on an interior record of a LEGACY journal (no
    // checksummed records — written under fsync-per-record, where only
    // the final record can tear): refuse to start — an acknowledged op
    // would otherwise vanish silently
    val j3 = Paths.get(dir, "j3")
    Files.writeString(j3, "P k2\nP k1 v1\n")
    val e = intercept[java.io.IOException](CoordServer.start(j3))
    assert(e.getMessage.contains("INTERIOR"))
  }

  test("group-commit tail: replay truncates at a torn NON-final record and scrubs it") {
    // Under group commit a power loss can leave SEVERAL unforced
    // trailing records, and out-of-order page flush can tear a
    // NON-final one — garbage followed by intact later records. Every
    // fsync covers a PREFIX of the file, so a torn record at position i
    // proves nothing at or after i was ever acknowledged: replay must
    // apply the intact prefix, drop the whole tail (including the
    // intact-looking records AFTER the tear), serve, and rewrite the
    // journal so the garbage is gone from disk.
    val dir = Files.createTempDirectory("graft-coord-gc-tear").toString
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())

    // build a real checksummed journal by running a server
    val j = Paths.get(dir, "j")
    val s0 = CoordServer.start(j)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s0.port)
      (0 until 5).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/acked_$i"), s"v$i"))
      }
    } finally s0.close()
    val lines = Files.readAllLines(j)
    assert(lines.size === 5 && lines.get(0).startsWith("#"),
      "expected a checksummed journal")

    // tear record 3 mid-line (bad CRC), keep records 4-5 intact: the
    // out-of-order-flush shape that used to refuse startup
    val torn = new java.lang.StringBuilder
    (0 until 2).foreach(i => torn.append(lines.get(i)).append('\n'))
    torn.append(lines.get(2).substring(0, lines.get(2).length - 4)).append('\n')
    (3 until 5).foreach(i => torn.append(lines.get(i)).append('\n'))
    Files.writeString(j, torn.toString)
    val s1 = CoordServer.start(j)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s1.port)
      (0 until 2).foreach { i =>
        assert(c.readSmall(fs, new HPath(s"$dir/acked_$i")).contains(s"v$i"),
          s"forced-prefix record $i lost")
      }
      // the torn record AND the intact-looking ones after it are gone —
      // none of them was ever acknowledged
      (2 until 5).foreach { i =>
        assert(c.readSmall(fs, new HPath(s"$dir/acked_$i")).isEmpty,
          s"unforced-tail record $i resurrected")
      }
      // the server keeps serving and journaling after the truncation
      assert(c.createIfAbsent(fs, new HPath(s"$dir/post"), "p"))
    } finally s1.close()
    // the scrub: the on-disk journal no longer carries the garbage, so
    // a second restart replays clean (2 recovered + 1 new = 3 records)
    val relines = Files.readAllLines(j)
    assert(relines.size === 3, s"torn tail not scrubbed: $relines")
    val s2 = CoordServer.start(j)
    try {
      val c2 = CommitCoordinator.remote("127.0.0.1", s2.port)
      assert(c2.readSmall(fs, new HPath(s"$dir/acked_0")).contains("v0"))
      assert(c2.readSmall(fs, new HPath(s"$dir/post")).contains("p"))
    } finally s2.close()

    // raw page-flush garbage (no '#', unparseable) after checksummed
    // records: same truncation — the tail need not keep the format
    val j2 = Paths.get(dir, "j2")
    Files.writeString(j2,
      lines.get(0) + "\n" + lines.get(1) + "\n  garbage\n" +
        lines.get(3) + "\n")
    val s3 = CoordServer.start(j2)
    try {
      val c3 = CommitCoordinator.remote("127.0.0.1", s3.port)
      assert(c3.readSmall(fs, new HPath(s"$dir/acked_0")).contains("v0"))
      assert(c3.readSmall(fs, new HPath(s"$dir/acked_1")).contains("v1"))
      assert(c3.readSmall(fs, new HPath(s"$dir/acked_3")).isEmpty)
    } finally s3.close()

    // a malformed body under a VERIFYING checksum is damage to
    // acknowledged state, not a tear: refuse loudly
    val j3 = Paths.get(dir, "j3")
    val crc = new java.util.zip.CRC32
    crc.update("X not a record".getBytes("UTF-8"))
    Files.writeString(j3,
      "#" + java.lang.Long.toHexString(crc.getValue) + " X not a record\n" +
        lines.get(0) + "\n")
    val e = intercept[java.io.IOException](CoordServer.start(j3))
    assert(e.getMessage.contains("VERIFYING checksum"))
  }

  test("shared-journal promotion: primary KILLED mid-churn, standby on the SAME journal path holds every acked win") {
    // Zero-acked-loss server replacement. Promotion from a COPY of the
    // journal loses whatever was acked after the copy; the deployment
    // that closes that hole is journal-on-shared-storage — the standby
    // promotes from the SAME journal path the dead primary wrote, so
    // the acked frontier travels with the journal. The primary is a
    // real child JVM killed FORCIBLY in the middle of a churn run (not
    // quiesced, no flush opportunity — the kill can land mid-group-
    // commit, mid-compaction, mid-anything); replay's torn-tail
    // handling covers whatever shape the journal was left in. Every
    // mutation the client saw ACKED before the kill must hold verbatim
    // on the promoted server; an op in flight at the kill may be lost
    // (it was never acked — the caller's at-most-once) or present
    // (journaled before the ack could be sent) — both are legal.
    val dir = Files.createTempDirectory("graft-coord-shared").toString
    val journal = Paths.get(dir, "shared.journal")
    val portFile = Paths.get(dir, "port")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val cp = repoRoot.resolve("target/scala-2.13/classes").toString +
      ":/opt/spark/jars/*"
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val proc = new ProcessBuilder(javaBin, "-cp", cp, "-Xmx256m",
      "graft.sources.CoordServer", journal.toString, portFile.toString)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$dir/server.log"))
      .start()
    val acked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var ackedDeletes = 0
    try {
      // poll for CONTENT, not existence — the child's write is not
      // atomic, so the file can exist momentarily empty
      val deadline = System.currentTimeMillis() + 30000
      def portNow(): Option[Int] =
        if (!Files.exists(portFile)) None
        else Files.readString(portFile).trim.toIntOption
      while (portNow().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      val port = portNow().getOrElse(fail("server never published its port"))
      val c = CommitCoordinator.remote("127.0.0.1", port)
      // killer thread: fires mid-churn, while ops are in flight — gated on
      // OBSERVED progress (>=10 acked wins), not wall-clock, so a slow-disk
      // window (each ack costs an fsync) cannot starve the precondition;
      // the wall-clock ceiling is only the hard stop against a hung server
      val ackedCount = new java.util.concurrent.atomic.AtomicInteger(0)
      val killer = new Thread(() => {
        val ceiling = System.currentTimeMillis() + 60000
        while (ackedCount.get() < 10 && System.currentTimeMillis() < ceiling)
          Thread.sleep(5)
        proc.destroyForcibly(); ()
      })
      killer.setDaemon(true); killer.start()
      try {
        var i = 0
        while (i < 1000000) { // until the kill severs the connection
          val k = s"$dir/win_$i"
          if (c.createIfAbsent(fs, new HPath(k), s"holder_$i")) {
            acked += ((k, s"holder_$i"))
            ackedCount.incrementAndGet()
          }
          // churn a lease to keep online compaction firing under the kill
          if (c.createIfAbsent(fs, new HPath(s"$dir/churn"), s"h$i") &&
              c.delete(fs, new HPath(s"$dir/churn"), false))
            ackedDeletes += 1
          i += 1
        }
        fail("churn loop outlived the kill")
      } catch { case _: java.io.IOException => () } // primary died mid-op
      assert(acked.size >= 10,
        s"only ${acked.size} acked wins before the kill — churn too short to prove anything")
    } finally { proc.destroyForcibly(); proc.waitFor(10, TimeUnit.SECONDS) }
    // promote on the SAME journal path the dead primary wrote
    val standby = CoordServer.start(journal)
    try {
      val c2 = CommitCoordinator.remote("127.0.0.1", standby.port)
      acked.foreach { case (k, v) =>
        assert(c2.readSmall(fs, new HPath(k)).contains(v),
          s"acked win $k lost — primary killed mid-churn, standby on shared journal")
      }
      // usurpers still lose over promoted state; new mutations proceed
      assert(!c2.createIfAbsent(fs, new HPath(acked.head._1), "usurper"))
      assert(c2.createIfAbsent(fs, new HPath(s"$dir/post_promo"), "p"))
    } finally standby.close()
  }

  test("standby promotion: a journal copy promoted on a new address holds every acknowledged win") {
    // server REPLACEMENT, not just restart: copy the live journal (a
    // crash-consistent copy — it may carry a torn tail, which replay
    // drops), kill the primary, promote a standby from the copy on a
    // NEW port, and point a fresh client at it. Every acknowledged
    // lease and stamp must hold verbatim, a usurper must still lose,
    // and new mutations must proceed on the promoted server.
    val dir = Files.createTempDirectory("graft-coord-promote").toString
    val journalA = Paths.get(dir, "primary.journal")
    val journalB = Paths.get(dir, "standby.journal")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val primary = CoordServer.start(journalA)
    val wins = (0 until 20).map(i => s"$dir/lease_$i" -> s"holder_$i")
    try {
      val c = CommitCoordinator.remote("127.0.0.1", primary.port)
      wins.foreach { case (k, v) =>
        assert(c.createIfAbsent(fs, new HPath(k), v))
      }
      assert(c.createIfAbsent(fs, new HPath(s"$dir/stamp"), "layout v2"))
      // copy while the primary is still LIVE (the realistic promotion
      // source: a replica of the journal, not a clean shutdown)
      Files.copy(journalA, journalB)
    } finally primary.close() // primary dies
    val standby = CoordServer.start(journalB)
    try {
      val c2 = CommitCoordinator.remote("127.0.0.1", standby.port)
      wins.foreach { case (k, v) =>
        assert(c2.readSmall(fs, new HPath(k)).contains(v),
          s"acknowledged win $k lost in promotion")
      }
      assert(c2.readSmall(fs, new HPath(s"$dir/stamp")).contains("layout v2"))
      // a usurper is still refused over promoted state
      assert(!c2.createIfAbsent(fs, new HPath(s"$dir/lease_0"), "usurper"))
      // and the promoted server accepts new acknowledged mutations
      assert(c2.createIfAbsent(fs, new HPath(s"$dir/lease_new"), "post-promotion"))
      assert(c2.rename(fs, new HPath(s"$dir/lease_new"),
        new HPath(s"$dir/lease_new_claimed")))
    } finally standby.close()
  }

  test("tailing follower without a final drain preserves exactly the last-poll frontier (loss bounded by lag)") {
    // the deterministic half of the follower contract: under true host
    // death with unreachable primary storage (modeled here by promoting
    // WITHOUT the final drain), the follower's own journal path holds
    // every win acked before its last completed poll — and, just as
    // deterministically, nothing acked after it. The loss window is the
    // tail lag, not "since the last manual copy".
    val dir = Files.createTempDirectory("graft-coord-tail-lag").toString
    val jA = Paths.get(dir, "primary.journal")
    val jB = Paths.get(dir, "follower.journal")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val primary = CoordServer.start(jA)
    val follower = new graft.sources.CoordFollower(jA, jB)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", primary.port)
      (0 until 20).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/pre_$i"), s"v$i"))
      }
      assert(follower.pollOnce(), "capture of the pre-frontier failed")
      (0 until 10).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/post_$i"), s"w$i"))
      }
    } finally primary.close()
    // promote from the FOLLOWER's path, no drain: the tailed frontier
    // and nothing beyond it
    val promoted = follower.promote(finalDrain = false)
    try {
      val c2 = CommitCoordinator.remote("127.0.0.1", promoted.port)
      (0 until 20).foreach { i =>
        assert(c2.readSmall(fs, new HPath(s"$dir/pre_$i")).contains(s"v$i"),
          s"win pre_$i acked before the last poll lost by the follower")
      }
      (0 until 10).foreach { i =>
        assert(c2.readSmall(fs, new HPath(s"$dir/post_$i")).isEmpty,
          s"post-poll win post_$i present without any poll — not tailing")
      }
      // the promoted server serves new acknowledged mutations
      assert(c2.createIfAbsent(fs, new HPath(s"$dir/after"), "a"))
    } finally promoted.close()
  }

  test("a reused follower path clears the previous promotion's stale fwm sidecar before publishing a capture") {
    // ADVICE r20 (medium): a server previously promoted AT the follower
    // path leaves `<followerJournal>.fwm` describing ITS journal;
    // CoordServer.start removes the sidecar only when the journal file
    // is missing. A fresh capture published next to that stale frontier
    // would have an unrelated bound clamped onto it — and a legitimate
    // capture-race torn tail at or below the clamp then REFUSES as
    // media corruption, blocking failover exactly when it is needed.
    // pollOnce must clear the sidecar when it publishes a new capture.
    val dir = Files.createTempDirectory("graft-coord-fwm-reuse").toString
    val jA = Paths.get(dir, "primary.journal")
    val jB = Paths.get(dir, "follower.journal")
    val fwm = jB.resolveSibling("follower.journal.fwm")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    // an earlier promotion ran a server at the follower path long
    // enough to cross the periodic forced-frontier rewrite (FwmEvery)
    val old = CoordServer.start(jB)
    try {
      val c0 = CommitCoordinator.remote("127.0.0.1", old.port)
      (0 until 70).foreach { i =>
        assert(c0.createIfAbsent(fs, new HPath(s"$dir/old_$i"), "x"))
      }
    } finally old.close()
    assert(Files.exists(fwm),
      "precondition: the earlier promotion left a forced-frontier sidecar")
    // a fresh primary on its own path, 10 acked wins, then death with a
    // torn tail (the capture-race shape: the follower reads the journal
    // mid-append)
    val primary = CoordServer.start(jA)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", primary.port)
      (0 until 10).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/new_$i"), s"v$i"))
      }
    } finally primary.close()
    Files.write(jA, "torn-mid-append-garbage".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val follower = new graft.sources.CoordFollower(jA, jB)
    assert(follower.pollOnce(), "capture failed")
    assert(!Files.exists(fwm),
      "publishing a fresh capture must clear the stale sidecar — the " +
        "frontier it names bounds an UNRELATED journal")
    // promotion must start (torn tail truncates under the legacy rule)
    // and serve every win acked before the tear
    val promoted = follower.promote(finalDrain = false)
    try {
      val c2 = CommitCoordinator.remote("127.0.0.1", promoted.port)
      (0 until 10).foreach { i =>
        assert(c2.readSmall(fs, new HPath(s"$dir/new_$i")).contains(s"v$i"),
          s"acked win new_$i lost through the reused-path promotion")
      }
      assert(c2.createIfAbsent(fs, new HPath(s"$dir/after"), "a"))
    } finally promoted.close()
  }

  test("journal-tailing standby: primary KILLED mid-churn, follower promoted from its OWN path, every acked win holds") {
    // the no-shared-storage deployment's replacement path: a follower
    // continuously re-captures the primary's journal into its OWN
    // journal path while a real child JVM churns mutations, the primary
    // is destroyed forcibly mid-churn (no quiesce, no flush
    // opportunity), and the follower promotes from its own path with
    // one final drain — legitimate whenever the journal file is still
    // readable after the process died (process death, or storage that
    // outlives the host; see CoordFollower's scaladoc for the
    // host-death lag bound the previous test pins). Every win the
    // client saw ACKED must hold verbatim on the promoted server.
    val dir = Files.createTempDirectory("graft-coord-tail-kill").toString
    val journal = Paths.get(dir, "primary.journal")
    val followerJournal = Paths.get(dir, "follower.journal")
    val portFile = Paths.get(dir, "port")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val cp = repoRoot.resolve("target/scala-2.13/classes").toString +
      ":/opt/spark/jars/*"
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val proc = new ProcessBuilder(javaBin, "-cp", cp, "-Xmx256m",
      "graft.sources.CoordServer", journal.toString, portFile.toString)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$dir/server.log"))
      .start()
    val follower = new graft.sources.CoordFollower(
      journal, followerJournal, intervalMs = 20L).start()
    val acked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      val deadline = System.currentTimeMillis() + 30000
      def portNow(): Option[Int] =
        if (!Files.exists(portFile)) None
        else Files.readString(portFile).trim.toIntOption
      while (portNow().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      val port = portNow().getOrElse(fail("server never published its port"))
      val c = CommitCoordinator.remote("127.0.0.1", port)
      // kill gated on observed acks (>=10), not a fixed sleep — see the
      // shared-journal test above for the rationale
      val ackedCount = new java.util.concurrent.atomic.AtomicInteger(0)
      val killer = new Thread(() => {
        val ceiling = System.currentTimeMillis() + 60000
        while (ackedCount.get() < 10 && System.currentTimeMillis() < ceiling)
          Thread.sleep(5)
        proc.destroyForcibly(); ()
      })
      killer.setDaemon(true); killer.start()
      try {
        var i = 0
        while (i < 1000000) { // until the kill severs the connection
          val k = s"$dir/win_$i"
          if (c.createIfAbsent(fs, new HPath(k), s"holder_$i")) {
            acked += ((k, s"holder_$i"))
            ackedCount.incrementAndGet()
          }
          if (c.createIfAbsent(fs, new HPath(s"$dir/churn"), s"h$i"))
            c.delete(fs, new HPath(s"$dir/churn"), false)
          i += 1
        }
        fail("churn loop outlived the kill")
      } catch { case _: java.io.IOException => () } // primary died mid-op
      assert(acked.size >= 10,
        s"only ${acked.size} acked wins before the kill — churn too short to prove anything")
    } finally { proc.destroyForcibly(); proc.waitFor(10, TimeUnit.SECONDS) }
    assert(follower.capturedPolls >= 1,
      "the follower never completed a live capture — the tail loop did not run")
    // promote from the follower's OWN journal path, with the final drain
    val standby = follower.promote(finalDrain = true)
    try {
      val c2 = CommitCoordinator.remote("127.0.0.1", standby.port)
      acked.foreach { case (k, v) =>
        assert(c2.readSmall(fs, new HPath(k)).contains(v),
          s"acked win $k lost — primary killed mid-churn, follower-promoted standby")
      }
      assert(!c2.createIfAbsent(fs, new HPath(acked.head._1), "usurper"))
      assert(c2.createIfAbsent(fs, new HPath(s"$dir/post_promo"), "p"))
    } finally standby.close()
  }

  test("forced-frontier sidecar: damage below the fsynced frontier refuses; tail drops keep .corrupt evidence") {
    // the r19 replay rule truncated at ANY invalid record once a
    // checksummed one had been seen — safe for crash tears, but
    // indistinguishable from media corruption of an OLD, FORCED,
    // ACKNOWLEDGED interior record, which it silently reverted (and
    // scrubbed the evidence). The `.fwm` sidecar bounds that: an
    // invalid record at or below the recorded forced frontier refuses
    // loudly; above it, truncation proceeds but keeps the dropped
    // bytes in `.corrupt` and reports intact-looking records after the
    // tear.
    val dir = Files.createTempDirectory("graft-coord-fwm").toString
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val j = Paths.get(dir, "j")
    // 10 acked wins; the NEXT start pins the 10-record frontier in the
    // sidecar (startup force + fwm write)
    val s0 = CoordServer.start(j)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s0.port)
      (0 until 10).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/acked_$i"), s"v$i"))
      }
    } finally s0.close()
    // this start writes fwm=10, then appends 5 more records (below the
    // FwmEvery interval, so the sidecar stays at 10)
    val s1 = CoordServer.start(j)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s1.port)
      (0 until 5).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/tail_$i"), s"w$i"))
      }
    } finally s1.close()
    assert(Files.exists(Paths.get(dir, "j.fwm")), "sidecar missing")
    val lines = Files.readAllLines(j)
    assert(lines.size === 15)
    // tear record 12 (ABOVE the 10-record frontier), keep 13-15 intact:
    // truncation proceeds, 12-15 drop, the bytes survive in .corrupt
    val above = new java.lang.StringBuilder
    (0 until 11).foreach(i => above.append(lines.get(i)).append('\n'))
    above.append(lines.get(11).substring(0, lines.get(11).length - 4)).append('\n')
    (12 until 15).foreach(i => above.append(lines.get(i)).append('\n'))
    Files.writeString(j, above.toString)
    val s2 = CoordServer.start(j)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s2.port)
      (0 until 10).foreach(i =>
        assert(c.readSmall(fs, new HPath(s"$dir/acked_$i")).contains(s"v$i")))
      assert(c.readSmall(fs, new HPath(s"$dir/tail_0")).contains("w0"),
        "the intact record above the frontier but before the tear must replay")
      (1 until 5).foreach(i =>
        assert(c.readSmall(fs, new HPath(s"$dir/tail_$i")).isEmpty,
          s"unforced record tail_$i past the tear resurrected"))
    } finally s2.close()
    val corrupt = Paths.get(dir, "j.corrupt")
    assert(Files.exists(corrupt), "dropped bytes must survive in .corrupt")
    assert(Files.readAllLines(corrupt).size === 4,
      "the torn record and the 3 intact-looking ones after it")
    // damage BELOW the frontier: s2's start scrubbed the journal to 11
    // records and re-pinned fwm=11; tear record 3 — replay must REFUSE,
    // not silently revert acked_2..10
    val clean = Files.readAllLines(j)
    assert(clean.size === 11, s"expected the scrubbed 11-record journal: $clean")
    val below = new java.lang.StringBuilder
    (0 until 2).foreach(i => below.append(clean.get(i)).append('\n'))
    below.append(clean.get(2).substring(0, clean.get(2).length - 4)).append('\n')
    (3 until 11).foreach(i => below.append(clean.get(i)).append('\n'))
    Files.writeString(j, below.toString)
    val e = intercept[java.io.IOException](CoordServer.start(j))
    assert(e.getMessage.contains("forced frontier"),
      s"expected the forced-frontier refusal, got: ${e.getMessage}")
  }
}
