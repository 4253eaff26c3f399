package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.{GraftSession, SparkEntry}

/** Shuffle-byte meter for named catalog entries: runs each query through
  * the noop sink with a stage-level listener summing shuffle WRITE bytes
  * and records (per entry) total shuffle bytes + wall seconds — the
  * evidence tool behind byte-oriented optimizations (e.g. the hashed-gram
  * substring-dedup path, whose whole point is shuffle bytes, not local
  * wall-time, since at sf0.1 both variants fit in page cache).
  *
  * Run: `tools/run.sh graft.tools.ShuffleBytes <sfDir> q_a q_b ...`
  * Prints one JSON object; copy the numbers into SCALE.md.
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).flatMap(_.split("[,\\s]+")).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-shuffle-bytes", cpus)
    val bytes = new AtomicLong(0)
    val records = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val rows = names.map { name =>
      scrub()
      // warm once so JIT/codegen doesn't ride the measured run's clock
      // (shuffle bytes are deterministic either way)
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      scrub()
      bytes.set(0); records.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // the listener bus drains asynchronously; give trailing stage
      // events a moment to land before reading the counters
      Thread.sleep(1500)
      val b = bytes.get; val r = records.get
      println(f"[shuffle] $name%-24s ${b / 1048576.0}%8.1f MiB  $r%10d recs  $sec%6.2f s")
      f""""$name": {"shuffle_mib": ${b / 1048576.0}%.1f, "shuffle_records": $r, "sec": $sec%.2f}"""
    }
    println(rows.mkString("{", ", ", "}"))
    spark.stop()
  }
}
