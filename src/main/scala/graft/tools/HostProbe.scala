package graft.tools

/** THE host-load probe — the one implementation of "how busy is this
  * machine with work that is not ours", shared by every harness that
  * needs it (the bench's per-entry window flags and isolated-re-run
  * quiet gate, ScaleProbe's exponent-integrity gate, and the shell load
  * harness via [[main]]). Factored out of Bench.scala in r17 — three
  * near-copies of a measurement this subtle is how they drift.
  *
  * Design (r16, validated against the load-window harness): host-wide
  * CPU utilization from /proc/stat over a short sample, MINUS this
  * process's own utime+stime in the same USER_HZ ticks. Two designs
  * proved blind before this one: a sparse calib series (one Spark job
  * per ~25 entries) misses an 8 s burst entirely, and a single-threaded
  * compute probe finds a free core whenever hogs < cores (28 hogs on 32
  * cores read QUIET while 32-thread queries ran 1.6× slow). Aggregate
  * external utilization is the thing the queries actually contend
  * against. Subtracting our own ticks matters because right after a
  * streaming entry this JVM's async teardown and GC alone read >0.5
  * host-busy on a perfectly quiet machine, which must not flag.
  */
object HostProbe {

  /** A sample above this is a contaminated window; a re-run is accepted
    * as quiet only under it. Between entries a quiet host reads our own
    * residue (GC, executor cleanup) at ~0.1-0.2; external contamination
    * that meaningfully bends a 32-thread sweep occupies half the cores
    * or more — 0.5 splits them with margin. */
  val WindowBusyThresh = 0.5

  /** EXTERNAL busy fraction of the host over `sampleMs`: host busy
    * minus this process's own ticks. Returns 0 (never flags) where
    * /proc/stat is unavailable. */
  def busyFraction(sampleMs: Long = 60): Double = {
    def read(): Option[(Long, Long, Long)] =
      try {
        val l = java.nio.file.Files
          .readAllLines(java.nio.file.Paths.get("/proc/stat")).get(0)
        val f = l.trim.split("\\s+").drop(1).map(_.toLong)
        // user nice system idle iowait irq softirq steal ...
        val idle = f(3) + (if (f.length > 4) f(4) else 0L)
        val self = java.nio.file.Files
          .readString(java.nio.file.Paths.get("/proc/self/stat"))
        // fields 14/15 (1-based, after the parenthesized comm which may
        // itself contain spaces): split after the closing paren
        val sf = self.substring(self.lastIndexOf(')') + 2).split("\\s+")
        val own = sf(11).toLong + sf(12).toLong // utime, stime
        Some((f.sum, idle, own))
      } catch { case scala.util.control.NonFatal(_) => None }
    val a = read()
    Thread.sleep(sampleMs)
    val b = read()
    (a, b) match {
      case (Some((t0, i0, o0)), Some((t1, i1, o1))) if t1 > t0 =>
        val ext = (t1 - t0) - (i1 - i0) - (o1 - o0)
        math.max(0.0, ext.toDouble / (t1 - t0).toDouble)
      case _ => 0.0
    }
  }

  /** Wait (in `stepMs` naps) until external busy reads at or under
    * `thresh`, spending from a SHARED budget — the bench's global
    * quiet budget across its whole isolated phase, not per entry:
    * under sustained load a per-entry wait times a dozen flagged
    * entries stalls minutes buying nothing. Returns whether the last
    * sample was quiet; once the budget is spent, callers proceed
    * immediately and report un-quiet. */
  def awaitQuiet(
      budgetMs: java.util.concurrent.atomic.AtomicLong,
      thresh: Double = WindowBusyThresh,
      stepMs: Long = 2000L): Boolean = {
    var p = busyFraction()
    while (p > thresh && budgetMs.getAndAdd(-stepMs) > 0) {
      Thread.sleep(stepMs); p = busyFraction()
    }
    p <= thresh
  }

  /** CLI for the shell harnesses: print N samples (default 1) at an
    * interval, one external-busy fraction per line — so the load
    * harness verifies its hog windows with the SAME probe the bench
    * flags them with. `HostProbe [n] [intervalMs] [sampleMs]`. */
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1
    val intervalMs = if (args.length > 1) args(1).toLong else 500L
    val sampleMs = if (args.length > 2) args(2).toLong else 60L
    (0 until n).foreach { i =>
      println(f"${busyFraction(sampleMs)}%.3f")
      if (i < n - 1) Thread.sleep(intervalMs)
    }
  }
}
