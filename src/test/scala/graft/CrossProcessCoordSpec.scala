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
      while (!Files.exists(portFile) && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      assert(Files.exists(portFile), "server never published its port")
      val port = Files.readString(portFile).trim.toInt
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

  test("the journal compacts to a snapshot when history dwarfs live state") {
    // lease churn grows the journal with op COUNT while the keyspace
    // stays lifecycle-sized — an unbounded replay at every restart is
    // the classic durable-log failure. Startup snapshots when history
    // exceeds 4x live keys: the rewritten journal is one P-record per
    // key, equivalent by construction.
    val dir = Files.createTempDirectory("graft-coord-compact").toString
    val journal = Paths.get(dir, "coord.journal")
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val s1 = CoordServer.start(journal)
    try {
      val c = CommitCoordinator.remote("127.0.0.1", s1.port)
      // 300 acquire/release cycles (600 journal records), 3 live keys
      (0 until 300).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/lease"), s"h$i"))
        assert(c.delete(fs, new HPath(s"$dir/lease"), false))
      }
      (0 until 3).foreach { i =>
        assert(c.createIfAbsent(fs, new HPath(s"$dir/stamp_$i"), s"layout $i"))
      }
      assert(Files.readAllLines(journal).size > 600)
    } finally s1.close()
    // restart: compaction fires, state intact, journal is now live-sized
    val s2 = CoordServer.start(journal)
    try {
      assert(Files.readAllLines(journal).size === 3)
      val c2 = CommitCoordinator.remote("127.0.0.1", s2.port)
      (0 until 3).foreach { i =>
        assert(c2.readSmall(fs, new HPath(s"$dir/stamp_$i"))
          .contains(s"layout $i"))
      }
      // post-snapshot appends keep working
      assert(c2.createIfAbsent(fs, new HPath(s"$dir/extra"), "x"))
    } finally s2.close()
    // and a third start replays snapshot + tail correctly
    val s3 = CoordServer.start(journal)
    try {
      val c3 = CommitCoordinator.remote("127.0.0.1", s3.port)
      assert(c3.readSmall(fs, new HPath(s"$dir/extra")).contains("x"))
      assert(c3.readSmall(fs, new HPath(s"$dir/stamp_1")).contains("layout 1"))
    } finally s3.close()
  }
}
