package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The TWO-JVM shape the lease file exists for. In-process specs
  * (LifecycleContractSpec's two-Catalog race) prove every layer above
  * the coordinator; this one falsifies-or-confirms the coordinator's
  * own cross-process claim by spawning real child JVMs
  * ([[graft.tools.LeaseRaceChild]]) that race
  * `CommitCoordinator.fileAtomics.createIfAbsent` and the rename
  * break-claim on one shared directory. Hadoop LocalFileSystem's
  * create(overwrite=false) is CHECK-then-create — under it, two
  * processes can both report a won acquisition (one's lease content
  * silently overwritten); the O_EXCL java.nio path is atomic across
  * processes on POSIX, so the invariant here is exactly one winner
  * per round, no exceptions, over hundreds of contended rounds.
  */
class CrossProcessLeaseSpec extends AnyFunSuite {

  private def repoRoot: java.nio.file.Path = {
    var d = Paths.get("").toAbsolutePath
    while (d != null && !Files.exists(d.resolve("build.sbt"))) d = d.getParent
    require(d != null, "repo root not found"); d
  }

  test("K child JVMs race lease create + break-claim: exactly one winner per round") {
    val dir = Files.createTempDirectory("graft-xproc-lease").toString
    val rounds = 400
    val kids = 4
    // seed the stale leases the break-claim rounds contend for
    (0 until rounds).foreach { r =>
      Files.writeString(Paths.get(dir, s"stale_$r"), "dead 0")
    }
    // child classpath: compiled classes + the Spark/Hadoop jar dir —
    // the same unmanaged layout build.sbt uses, no sbt in the child
    val cp = repoRoot.resolve("target/scala-2.13/classes").toString +
      ":/opt/spark/jars/*"
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val procs = (0 until kids).map { k =>
      new ProcessBuilder(javaBin, "-cp", cp, "-Xmx512m",
        "graft.tools.LeaseRaceChild", dir, s"child$k", rounds.toString)
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
    // parse each child's win log
    val winsByChild: Map[String, Seq[String]] = (0 until kids).map { k =>
      val f = Paths.get(dir, s"wins_child$k")
      s"child$k" -> (if (Files.exists(f))
        Files.readString(f).linesIterator.filter(_.nonEmpty).toSeq
      else Seq.empty)
    }.toMap
    // exactly one CREATE winner per round, and the on-disk lease
    // content names that same winner (a double-win under
    // check-then-create would leave one claimant's content clobbered)
    val createWinners: Map[Int, Seq[String]] = winsByChild.toSeq
      .flatMap { case (kid, ws) =>
        ws.collect { case s if s.startsWith("create ") =>
          s.stripPrefix("create ").toInt -> kid }
      }.groupMap(_._1)(_._2)
    assert(createWinners.size === rounds, "some round had NO create winner")
    val doubleCreates = createWinners.filter(_._2.size > 1)
    assert(doubleCreates.isEmpty,
      s"non-atomic create-if-absent: rounds ${doubleCreates.keys.take(5)} " +
        "were won by multiple processes")
    createWinners.foreach { case (r, Seq(kid)) =>
      assert(Files.readString(Paths.get(dir, s"round_${r}__lease")) === kid,
        s"round $r lease content does not match its sole winner")
    }
    // exactly one CLAIM winner per stale file, matched by exactly one
    // claimed_<r>_* on disk and the stale source gone
    val claimWinners: Map[Int, Seq[String]] = winsByChild.toSeq
      .flatMap { case (kid, ws) =>
        ws.collect { case s if s.startsWith("claim ") =>
          s.stripPrefix("claim ").toInt -> kid }
      }.groupMap(_._1)(_._2)
    assert(claimWinners.size === rounds, "some stale lease was never claimed")
    val doubleClaims = claimWinners.filter(_._2.size > 1)
    assert(doubleClaims.isEmpty,
      s"non-atomic rename-claim: rounds ${doubleClaims.keys.take(5)}")
    (0 until rounds).foreach { r =>
      val claims = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .count(_.contains(s"claimed_${r}_"))
      assert(claims === 1, s"stale_$r left $claims claim files")
      assert(!Files.exists(Paths.get(dir, s"stale_$r")),
        s"stale_$r survived its claim")
    }
    // contention sanity: the barrier + frontier catch-up must produce
    // real cross-process contention, not one child sweeping unopposed
    val distinctCreateWinners = createWinners.values.flatten.toSet
    assert(distinctCreateWinners.size >= 2,
      s"only ${distinctCreateWinners} ever won — race never contended; " +
        "raise rounds or check the go-file barrier")
  }
}
