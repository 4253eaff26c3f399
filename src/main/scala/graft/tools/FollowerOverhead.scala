package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import graft.sources.{CommitCoordinator, CoordFollower, CoordServer}

/** Measures what the journal-tailing standby ([[CoordFollower]]) costs
  * the PRIMARY's commit path — the operational question an operator
  * asks before turning it on. The follower reads the journal file and
  * never touches the server's lock or channel, so the designed answer
  * is "nothing but page-cache traffic"; this probe makes it a number:
  *
  *  1. BASELINE: one client, N PIA/DEL lease-churn mutations against a
  *     fresh server, mutations/s (the per-caller fsync wall — same
  *     workload as [[CoordThroughput]]'s 1-client point).
  *  2. TAILED: identical run with a CoordFollower polling at
  *     `intervalMs` into its own journal path.
  *  3. PROMOTION: after the tailed run the primary closes and the
  *     follower promotes (final drain + replay + startup force) — the
  *     wall-clock of the failover an operator plans around, verified
  *     by reading a key written before the close.
  *
  * Medians of 3 runs; per-run values in the JSON (fsync-bound numbers
  * ride the host's disk windows — single shots are uninformative).
  *
  * Writes `scale/follower_overhead.json`.
  * Run: `tools/run.sh graft.tools.FollowerOverhead [mutations] [intervalMs]`.
  */
object FollowerOverhead {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val mutations = if (args.nonEmpty) args(0).toInt else 4000
    val intervalMs = if (args.length > 1) args(1).toLong else 20L
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())

    def churn(dir: String, port: Int): Double = {
      val c = CommitCoordinator.remote("127.0.0.1", port)
      val t0 = System.nanoTime()
      var i = 0
      while (i < mutations / 2) {
        c.createIfAbsent(fs, new HPath(s"$dir/lease"), s"h$i")
        c.delete(fs, new HPath(s"$dir/lease"), false)
        i += 1
      }
      mutations / ((System.nanoTime() - t0) / 1e9)
    }

    val runs = (1 to 3).map { r =>
      val dir = Files.createTempDirectory(s"graft-follower-ovh-$r").toString
      // baseline: no follower
      val j0 = Paths.get(dir, "solo.journal")
      val s0 = CoordServer.start(j0)
      val base = try churn(s"$dir/a", s0.port) finally s0.close()
      // tailed: follower polling the live journal into its own path
      val j1 = Paths.get(dir, "primary.journal")
      val j2 = Paths.get(dir, "follower.journal")
      val s1 = CoordServer.start(j1)
      val fol = new CoordFollower(j1, j2, intervalMs).start()
      val tailed =
        try {
          val v = churn(s"$dir/b", s1.port)
          val c = CommitCoordinator.remote("127.0.0.1", s1.port)
          require(c.createIfAbsent(fs, new HPath(s"$dir/pin"), "p"))
          v
        } finally s1.close()
      // promotion: final drain + replay + startup force, then serve
      val t0 = System.nanoTime()
      val promoted = fol.promote(finalDrain = true)
      val promoteSec = (System.nanoTime() - t0) / 1e9
      try {
        val c2 = CommitCoordinator.remote("127.0.0.1", promoted.port)
        require(c2.readSmall(fs, new HPath(s"$dir/pin")).contains("p"),
          "acked pin lost across promotion")
      } finally promoted.close()
      println(f"[follower-ovh] run$r base $base%.0f mut/s  tailed $tailed%.0f mut/s  promote $promoteSec%.3f s  polls ${fol.capturedPolls}%d")
      (base, tailed, promoteSec, fol.capturedPolls)
    }
    val json =
      s"""{"mutations":$mutations,"interval_ms":$intervalMs,""" +
      s""""base_mut_per_sec":${f"${median(runs.map(_._1))}%.0f"},""" +
      s""""tailed_mut_per_sec":${f"${median(runs.map(_._2))}%.0f"},""" +
      s""""promote_sec":${f"${median(runs.map(_._3))}%.3f"},""" +
      s""""runs":[${runs.map(r =>
        f"""{"base":${r._1}%.0f,"tailed":${r._2}%.0f,"promote":${r._3}%.3f,"polls":${r._4}%d}""").mkString(",")}]}"""
    println(json)
    Files.createDirectories(Paths.get("scale"))
    Files.writeString(Paths.get("scale/follower_overhead.json"), json + "\n")
  }
}
