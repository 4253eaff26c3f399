package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{functions => F}
import graft.operators.{Dedup, Sessions, TopN}

/** Planted-skew stress at the sf1 scale: a 10^6-event hot key driven
  * through the three operators whose scale posture depends on bounded
  * per-task state — [[TopN.topKPerGroup]] (bounded sketch before the
  * shuffle), [[Sessions.ewmaByKey]] (spill-through sort + O(1) fold),
  * and [[Dedup.minhashCandidates]] (bucket caps). Each case asserts the
  * RESULT is exact AND the mechanism held: the top-k exchange stays
  * KB-sized regardless of the hot group, task peak execution memory
  * stays far below the hot key's row volume, and a degenerate LSH
  * bucket pairs exactly its capped prefix — the assertions that would
  * catch a collect_list/window resurrection the moment it reappears.
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  /** Collect per-task peak execution memory and total shuffle bytes
    * written across everything `body` executes (listener-bus flush is
    * polled to quiescence — task-end events arrive asynchronously).
    */
  private def withTaskStats[T](body: => T): (T, Long, Long) = {
    val peak = new AtomicLong(0L)
    val shuffle = new AtomicLong(0L)
    val seen = new AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          peak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          seen.incrementAndGet()
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val out = body
      // quiesce: wait until no new task-end events arrive for 200ms
      var last = -1L
      while (last != seen.get()) { last = seen.get(); Thread.sleep(200) }
      (out, peak.get(), shuffle.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("topKPerGroup: 10^6-event hot group shuffles a sketch, not the group") {
    // group 0 holds 10^6 rows, groups 1..9 hold 1000 each; scores are the
    // row index, so the exact top-5 of the hot group is ids 999_999 down
    // to 999_995 — any dropped or duplicated sketch entry shows up here
    val hot = spark.range(1000000L)
      .select(F.lit(0L).as("g"), $"id", $"id".cast("double").as("score"))
    val cold = spark.range(1000L).select(
      (F.pmod($"id", F.lit(9)) + 1).as("g"), ($"id" + 2000000L).as("id"),
      $"id".cast("double").as("score"))
    val (rows, _, shuffleBytes) = withTaskStats {
      TopN.topKPerGroup(hot.unionByName(cold), Seq("g"), "score", "id", k = 5)
        .collect()
    }
    assert(rows.length === 50) // 10 groups x k
    val hotTop = rows.filter(_.getLong(0) == 0L)
      .sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
    assert(hotTop === Seq(999999L, 999998L, 999997L, 999996L, 999995L))
    // the exchange after the partial topk_pairs carries at most
    // mapTasks x groups x k entries — a window/collect_list formulation
    // would shuffle all 10^6 rows (~tens of MB) and trip this bound
    assert(shuffleBytes < (1L << 20),
      s"top-k shuffled ${shuffleBytes}B — the bounded sketch did not engage")
  }

  test("ewmaByKey: 10^6-event hot key folds with O(1) state, exact to the driver loop") {
    val n = 1000000L
    // deterministic quarter-dollar values (k/4 and k*25 are exact in
    // binary, so floor(value*100) is replayable); ts strictly increasing
    // so the fold order is the row order
    val ev = spark.range(n).select(
      F.lit(42L).as("user_id"),
      F.timestamp_micros($"id" * 1000000L).as("ts"),
      $"id".as("event_id"),
      ($"id" % 128L).cast("double").divide(4.0).as("value"))
    val (rows, peak, _) = withTaskStats {
      Sessions.ewmaByKey(ev).collect()
    }
    assert(rows.length === 1)
    var s = 0L
    var i = 0L
    while (i < n) { val x = (i % 128L) * 25L; s = if (i == 0) x else (x + s) >> 1; i += 1 }
    assert(rows(0).getLong(0) === 42L)
    assert(rows(0).getLong(1) === n)
    assert(rows(0).getLong(2) === s)
    // the hot key's 10^6 rows sort through the external sorter and fold
    // with two longs of state; a collect-the-key-into-one-buffer
    // formulation scales peak memory with the key's volume instead
    assert(peak < (512L << 20),
      s"ewma task peak execution memory ${peak}B scales with the hot key")
  }

  test("minhashCandidates: 10^5-doc degenerate bucket pairs exactly its capped prefix") {
    // 100_000 byte-identical docs share every band bucket; the bounded
    // min-k aggregate must cap each bucket at the 200 smallest ids
    // BEFORE pairing, so the candidate set is exactly C(200,2) pairs
    // over ids 0..199 — never the 5*10^9-pair cross product
    val hot = spark.range(100000L).select(
      $"id".as("doc_id"),
      F.lit("same boilerplate paragraph stamped on every page of the crawl").as("text"))
    val pairs = Dedup.minhashCandidates(hot)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === 199 * 200 / 2)
    assert(pairs.forall { case (a, b) => a < b && b < 200L })
  }

  test("topKPerGroup holds its plan shape on the sf1 events table") {
    // the 10x locally generated dataset (tools/ScaleUp); skipped where it
    // has not been generated
    assume(new java.io.File("localdata/sf1/events.parquet").exists())
    val ev = spark.read.parquet("localdata/sf1/events.parquet")
      .select($"user_id", $"event_id", $"value")
    val (rows, _, shuffleBytes) = withTaskStats {
      TopN.topKPerGroup(ev, Seq("user_id"), "value", "event_id", k = 3).collect()
    }
    assert(rows.nonEmpty)
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    // 10^6 events reduce to <= maps x users x 3 sketch entries
    assert(shuffleBytes < (64L << 20),
      s"sf1 top-k shuffled ${shuffleBytes}B — sketch did not engage")
  }
}
