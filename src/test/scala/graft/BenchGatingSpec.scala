package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validation of the round-over-round mover gating ([[Bench.moverTrigger]])
  * against the REAL archived r15 round — no sweep needed, both
  * directions (the r15 verdict's ask):
  *
  *  - a uniform HOST-SPEED shift (every raw median and every calib
  *    probe ×1.5 — a loaded or slower host) fires ZERO movers, because
  *    the normalized value med ÷ calib is invariant under it;
  *  - one injected PER-ENTRY regression (that entry's median ×2 with
  *    the host unchanged) fires EXACTLY that one mover;
  *  - against a pre-normalization archive (no `normalized` map) the
  *    trigger falls back to raw medians, so the same host shift DOES
  *    fire — which is why the normalized map exists.
  */
class BenchGatingSpec extends AnyFunSuite {

  // parse the committed archive with the same shapes Bench.main uses
  private lazy val archive: String = {
    var d = java.nio.file.Paths.get("").toAbsolutePath
    while (d != null && !java.nio.file.Files.exists(d.resolve("build.sbt")))
      d = d.getParent
    java.nio.file.Files.readString(d.resolve("bench_rounds/round15.json"))
  }
  private lazy val priorMeds: Map[String, Double] =
    """"([^"]+)":\{"n":\d+,"min":[0-9.eE+-]+,"med":([0-9.eE+-]+)""".r
      .findAllMatchIn(archive).map(m => m.group(1) -> m.group(2).toDouble).toMap
  private lazy val priorNorm: Map[String, Double] =
    """"normalized":\{([^}]*)\}""".r.findFirstMatchIn(archive)
      .map(_.group(1)).map { body =>
        """"([^"]+)":([0-9.eE+-]+)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }.getOrElse(Map.empty)

  // entries carrying both a prior median and a prior normalized value —
  // the population the normalized trigger actually gates
  private lazy val gated: Map[String, (Double, Double)] =
    priorMeds.flatMap { case (k, med) =>
      priorNorm.get(k).filter(_ > 0).filter(_ => med > 0)
        .map(nv => k -> (med, nv))
    }

  test("the archived r15 round carries a usable normalized baseline") {
    assert(gated.size > 150,
      s"only ${gated.size} entries have (med, normalized) — archive broken?")
  }

  test("a uniform 1.5x host shift replayed over r15 fires zero movers") {
    // derive each entry's implied calib divisor from the archive
    // (normalized = med / calib), scale BOTH med and calib by 1.5 —
    // the loaded-host replay — and recompute normalized the way the
    // sweep would
    val movers = gated.collect { case (k, (med, nv)) =>
      val calib = med / nv
      val medShifted = med * 1.5
      val calibShifted = calib * 1.5
      val nvShifted = medShifted / calibShifted
      k -> Bench.moverTrigger(nvShifted, Some(nv), medShifted, Some(med))
    }.filter(_._2).keys.toSeq
    assert(movers.isEmpty,
      s"host shift misread as regression for: ${movers.take(5).mkString(", ")}")
  }

  test("one injected per-entry regression fires exactly that mover") {
    val victim = gated.keys.min // deterministic pick
    val movers = gated.collect { case (k, (med, nv)) =>
      val calib = med / nv
      val medNow = if (k == victim) med * 2.0 else med
      val nvNow = medNow / calib
      k -> Bench.moverTrigger(nvNow, Some(nv), medNow, Some(med))
    }.filter(_._2).keys.toSeq
    assert(movers === Seq(victim),
      s"expected only $victim to fire, got: ${movers.take(5).mkString(", ")}")
  }

  test("headline promotion: a >2x in-sweep spread with an isolated re-run reports the isolated value") {
    // the r15 driver-artifact shape: q_bm25_stream measured 28.3 s
    // in-sweep under host windows, 13.0 s isolated on the same build —
    // the spread proves contamination, so the isolated number IS the
    // headline (r16), while the raw runs stay in the spread
    val contaminated = Bench.Spread(Seq(28.3, 13.2, 26.9), isolated = 13.0)
    assert(contaminated.highVariance)
    assert(contaminated.point === 13.0)
    assert(contaminated.med === 26.9) // raw median still visible in spreads
    // a consistent measurement keeps its sweep median even when an
    // isolated run exists (movers get one for adjudication): promotion
    // requires the variance EVIDENCE, not just an alternative number
    val consistent = Bench.Spread(Seq(13.5, 14.1, 13.8), isolated = 12.9)
    assert(!consistent.highVariance)
    assert(consistent.point === 13.8)
    // no isolated run -> the median stands, high variance or not
    assert(Bench.Spread(Seq(28.3, 13.2, 26.9)).point === 26.9)
    // a failed attempt fails the entry; promotion never resurrects it
    assert(Bench.Spread(Seq(Double.NaN, 13.2, 26.9), isolated = 13.0).failed)
  }

  test("window-flagged promotion: consistent contamination promotes, un-quiet isolated does not") {
    // the r16 load-harness finding: an entry small enough to sit
    // entirely inside a load window inflates CONSISTENTLY (spread
    // <2x), so spread-based promotion never fires — the bracketing
    // host probes flag it instead, and the quiet-gated isolated run
    // is the headline
    val consistent = Bench.Spread(Seq(2.29, 2.12, 2.43),
      isolated = 1.78, windowed = true)
    assert(!consistent.highVariance)
    assert(consistent.point === 1.78)
    // the second finding: an isolated re-run that itself landed on a
    // load window (probe never read quiet) is as contaminated as the
    // sweep — promotion refuses, the median stands
    val dirtyIso = Bench.Spread(Seq(2.36, 3.17, 3.38),
      isolated = 4.43, windowed = true, isolatedQuiet = false)
    assert(dirtyIso.point === 3.17)
    // window flag without an isolated run: median stands
    assert(Bench.Spread(Seq(2.29, 2.12, 2.43), windowed = true).point === 2.29)
  }

  test("against a pre-normalization archive the raw fallback fires on a host shift") {
    // no prior normalized → the trigger compares raw medians, so a
    // 1.6x host shift DOES read as movement — the behavior the
    // normalized map was added to fix (r15's driver re-run at load
    // 3.67 flagged 14 spurious movers this way)
    val (med, _) = gated(gated.keys.min)
    assert(Bench.moverTrigger(Double.NaN, None, med * 1.6, Some(med)))
    // and an in-noise raw change does not
    assert(!Bench.moverTrigger(Double.NaN, None, med * 1.2, Some(med)))
  }

  test("a promotion this round does not manufacture a mover next round (estimator symmetry)") {
    // The r16 asymmetry (ADVICE): round N promotes an isolated value
    // (point 2.0 << window-inflated med 4.2), archives point-normalized
    // 2.0; round N+1's check divides ITS med (again window-inflated,
    // 4.2) by calib and compares against the archive — 4.2/2.0 = 2.1x,
    // a spurious mover costing an avoidable isolated re-run. The fix
    // archives a median-based map (`normalized_med`) and the parser
    // prefers it, so both sides are the same estimator.
    val archive =
      """{"metric":"total","harness":"h1","workload":"w1",""" +
        """"queries":{"q_x":{"n":3,"min":3.9,"med":4.2,"max":4.4}},""" +
        """"normalized":{"q_x":2.0000},""" +
        """"normalized_med":{"q_x":4.2000}}"""
    val (meds, norm) = Bench.parsePriorArchive(archive, "h1", "w1")
    assert(meds("q_x") === 4.2)
    assert(norm("q_x") === 4.2, "parser must prefer the median-based map")
    // next round: med-normalized 4.2 again (same window inflation) —
    // same estimator on both sides, no mover
    assert(!Bench.moverTrigger(4.2, Some(norm("q_x")), 4.2, Some(meds("q_x"))))
    // the counterfactual the med-map removes: a point-based 2.0
    // baseline makes the identical measurement read as a 2.1x
    // NORMALIZED move — suppressed since r17 only because the raw
    // median (4.2 vs 4.2) refuses to corroborate. Layered defense:
    // either fix alone kills this false positive.
    assert(!Bench.moverTrigger(4.2, Some(2.0), 4.2, Some(meds("q_x"))))
    // a GENUINE move (normalized AND raw both up) still fires
    assert(Bench.moverTrigger(7.0, Some(norm("q_x")), 7.0, Some(meds("q_x"))))
  }

  test("calib-only variance fires zero movers; a corroborated move still fires") {
    // The r17 live incident: an idle fast host ran the CPU-pure calib
    // 1.7x faster than the prior round while the fs-bound queries
    // barely moved — every med/calib inflated ~1.7x and 46 spurious
    // movers fired (all isolated re-runs confirmed parity). The raw
    // median must corroborate a normalized move.
    val movers = gated.collect { case (k, (med, nv)) =>
      // same med, calib 1.7x faster => normalized inflates 1.7x
      k -> Bench.moverTrigger(nv * 1.7, Some(nv), med, Some(med))
    }.filter(_._2).keys.toSeq
    assert(movers.isEmpty,
      s"calib variance misread as regression for: ${movers.take(5).mkString(", ")}")
    // a real regression on that same fast host: med 2x, calib 1.7x
    // faster => normalized 3.4x, raw 2x — both corroborate, fires
    val (med, nv) = gated(gated.keys.min)
    assert(Bench.moverTrigger(nv * 3.4, Some(nv), med * 2.0, Some(med)))
    // improvements corroborate downward the same way
    assert(Bench.moverTrigger(nv / 3.4, Some(nv), med / 2.0, Some(med)))
    assert(!Bench.moverTrigger(nv / 1.7, Some(nv), med, Some(med)))
  }

  test("archive parsing: pre-r17 fallback and stamp gating") {
    // no normalized_med (pre-r17 archive) → fall back to the point map
    val old =
      """{"harness":"h1","workload":"w1",""" +
        """"queries":{"q_y":{"n":3,"min":1.0,"med":1.1,"max":1.2}},""" +
        """"normalized":{"q_y":1.1000}}"""
    val (m1, n1) = Bench.parsePriorArchive(old, "h1", "w1")
    assert(m1("q_y") === 1.1 && n1("q_y") === 1.1)
    // harness or workload mismatch → empty maps, no trigger can fire
    assert(Bench.parsePriorArchive(old, "h2", "w1") === (Map.empty, Map.empty))
    assert(Bench.parsePriorArchive(old, "h1", "w2") === (Map.empty, Map.empty))
    // the REAL r15 archive parses identically through the factored
    // helper and the spec's own regexes (guards drift between them)
    val hh = """"harness":"([^"]+)"""".r.findFirstMatchIn(archive).get.group(1)
    val ww = """"workload":"([^"]+)"""".r.findFirstMatchIn(archive).get.group(1)
    val (m2, n2) = Bench.parsePriorArchive(archive, hh, ww)
    assert(m2 === priorMeds)
    assert(n2 === priorNorm, "r15 has no normalized_med — point map is the baseline")
  }
}
