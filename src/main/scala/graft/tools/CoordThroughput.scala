package graft.tools

import java.nio.file.{Files, Path, Paths}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import graft.sources.{CommitCoordinator, CoordServer}

/** Measures the [[CoordServer]] operational envelope — the doc's
  * "thousands of ops/s on one fsync-bound thread" becomes a number:
  *
  *  1. SATURATION: N client threads (each with its own remote
  *     connection) hammer PIA/DEL lease churn against one server;
  *     reports mutations/s per client count. The 1-client figure is
  *     the per-caller fsync wall (a solo mutation pays one full
  *     force); the multi-client curve measures GROUP COMMIT — each
  *     leader force covers everything queued behind it, so the curve
  *     should RISE with clients. This probe measured the pre-group-
  *     commit server declining to ~2k/s at 16 clients (lock hand-off
  *     with one fsync per mutation), which motivated the fix; the
  *     committed JSON is the post-fix curve.
  *  2. CROSS-PROCESS DIVIDEND: two child Spark JVMs run two index
  *     families' lifecycle ops (same mixes as [[ConcurrencyDividend]])
  *     through ONE server — serial (one JVM at a time) vs concurrent
  *     (barrier-released), spans measured inside the children so JVM
  *     boot is excluded. This is the production multi-writer shape:
  *     exclusion in the lock service, writers in separate processes.
  *
  * Writes `scale/coord_throughput.json`.
  * Run: `tools/run.sh graft.tools.CoordThroughput [mutationsPerThread] [familyOps]`.
  */
object CoordThroughput {

  private def repoRoot: Path = {
    var d = Paths.get("").toAbsolutePath
    while (d != null && !Files.exists(d.resolve("build.sbt"))) d = d.getParent
    require(d != null, "repo root not found"); d
  }

  private val opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
    "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(m => Seq("--add-opens", s"$m=ALL-UNNAMED"))

  private def spawnChild(family: String, wh: String, port: Int, ops: Int,
      sync: String, id: String): Process = {
    val cp = repoRoot.resolve("target/scala-2.13/classes").toString +
      ":/opt/spark/jars/*"
    val javaBin = System.getProperty("java.home") + "/bin/java"
    new ProcessBuilder(
      (Seq(javaBin) ++ opens ++ Seq("-Xmx4g", "-cp", cp,
        "-Dspark.ui.enabled=false",
        "graft.tools.CoordDividendChild", family, wh, port.toString,
        ops.toString, sync, id)): _*)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$sync/out_$id"))
      .start()
  }

  private def awaitReady(sync: String, ids: Seq[String]): Unit = {
    val deadline = System.currentTimeMillis() + 180000
    while (ids.exists(id => !Files.exists(Paths.get(sync, s"ready_$id")))
           && System.currentTimeMillis() < deadline) Thread.sleep(10)
    require(ids.forall(id => Files.exists(Paths.get(sync, s"ready_$id"))),
      "child JVM never became ready")
  }

  private def span(sync: String, id: String): (Long, Long) = {
    val Array(a, b) = Files.readString(Paths.get(sync, s"span_$id"))
      .trim.split(" ")
    (a.toLong, b.toLong)
  }

  def main(args: Array[String]): Unit = {
    val perThread = if (args.nonEmpty) args(0).toInt else 2000
    val familyOps = if (args.length > 1) args(1).toInt else 8
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())

    // ---- phase 1: saturation ----
    val satDir = Files.createTempDirectory("graft-coord-sat")
    val server = CoordServer.start(satDir.resolve("journal"))
    val saturation = Seq(1, 2, 4, 8, 16).map { n =>
      val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val t0 = System.nanoTime()
      val threads = (0 until n).map { t =>
        new Thread(() => try {
          val c = CommitCoordinator.remote("127.0.0.1", server.port)
          (0 until perThread).foreach { i =>
            c.createIfAbsent(fs, new HPath(s"k_${t}_$i"), "v")
            c.delete(fs, new HPath(s"k_${t}_$i"), false)
          }
        } catch { case e: Throwable => errs.set(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      if (errs.get != null) throw errs.get
      val sec = (System.nanoTime() - t0) / 1e9
      val mutations = 2L * n * perThread
      val opsSec = mutations / sec
      println(f"[coord-throughput] clients=$n%2d mutations=$mutations " +
        f"wall=$sec%.2fs ops/s=$opsSec%.0f")
      (n, opsSec)
    }
    server.close()

    // ---- phase 2: cross-process dividend (two Spark JVMs, one server) ----
    def runLeg(concurrent: Boolean): Double = {
      val sync = Files.createTempDirectory("graft-coord-divleg").toString
      val wh = Files.createTempDirectory("graft-coord-divwh").toString
      val srv = CoordServer.start(Paths.get(sync, "journal"))
      try {
        if (concurrent) {
          val p1 = spawnChild("dedup", s"$wh/dd", srv.port, familyOps, sync, "dd")
          val p2 = spawnChild("bm25", s"$wh/bm", srv.port, familyOps, sync, "bm")
          awaitReady(sync, Seq("dd", "bm"))
          Files.writeString(Paths.get(sync, "go"), "")
          require(p1.waitFor(600, java.util.concurrent.TimeUnit.SECONDS) &&
            p2.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
            "dividend child did not finish")
          require(p1.exitValue() == 0 && p2.exitValue() == 0,
            s"dividend child crashed — see $sync/out_dd / out_bm")
          val (s1, e1) = span(sync, "dd"); val (s2, e2) = span(sync, "bm")
          (math.max(e1, e2) - math.min(s1, s2)) / 1e3
        } else {
          // serial: one at a time, barrier released immediately, spans sum
          Seq(("dedup", "dd"), ("bm25", "bm")).map { case (fam, id) =>
            val legSync = Files.createTempDirectory("graft-coord-divser").toString
            val p = spawnChild(fam, s"$wh/$id-ser", srv.port, familyOps, legSync, id)
            awaitReady(legSync, Seq(id))
            Files.writeString(Paths.get(legSync, "go"), "")
            require(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
              "dividend child did not finish")
            require(p.exitValue() == 0,
              s"dividend child crashed — see $legSync/out_$id")
            val (s, e) = span(legSync, id); (e - s) / 1e3
          }.sum
        }
      } finally srv.close()
    }
    val serialSec = runLeg(concurrent = false)
    val concSec = runLeg(concurrent = true)
    val ratio = serialSec / concSec
    println(f"[coord-throughput] cross-process serial=$serialSec%.2fs " +
      f"concurrent=$concSec%.2fs ratio=$ratio%.2f")

    val satJson = saturation
      .map { case (n, s) => f""""$n": ${s}%.0f""" }.mkString("{", ", ", "}")
    val json =
      f"""{"mutations_per_thread": $perThread, "ops_per_sec_by_clients": $satJson, "family_ops": $familyOps, "xproc_serial_sec": $serialSec%.2f, "xproc_concurrent_sec": $concSec%.2f, "xproc_ratio": $ratio%.2f, "note": "phase 1: PIA/DEL churn, N threads against one CoordServer; 1-client = the per-op fsync wall, multi-client scales under group commit (one force amortizes across queued mutations); phase 2: two child Spark JVMs (dedup replace-ops, bm25 ingests) coordinating through one server, spans measured in-child (boot excluded)"}"""
    Files.createDirectories(Paths.get("scale"))
    Files.writeString(Paths.get("scale/coord_throughput.json"), json + "\n")
    println(json)
  }
}
