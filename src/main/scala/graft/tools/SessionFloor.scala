package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.GraftSession

/** Floor + GC decomposition for the q_sessionize_stream twin — the
  * StreamFloor discipline applied to the round's one unexplained
  * round-over-round mover (r12: committed med 3.25 → 4.55 s at the same
  * harness). Replays the twin's EXACT input shape (events → two
  * event-time ntile tiles + two far-future sentinel batches, one file
  * per micro-batch, shuffle width 8) through:
  *
  *  - `noop`: the same 4-file stream and checkpoint machinery with a
  *    no-op foreachBatch — the file-source + trigger floor, no state
  *    store at all;
  *  - `session`: the full flatMapGroupsWithState sessionize + collect
  *    body, exactly the graded twin.
  *
  * Each phase runs min-of-2 cold and records, per run, the JVM-wide GC
  * time delta (all collectors) and the engine's own accounting from
  * StreamingQueryProgress — summed triggerExecution / addBatch ms and
  * state-store allUpdates/allRemovals/commit ms — so a wall-clock delta
  * can be split into (file/trigger floor) + (state work) + (GC). The
  * SCALE.md adjudication runs this at two driver heaps
  * (`SPARK_DRIVER_MEM=8g` / `48g` via tools/run.sh) because the r12
  * A/B showed this family is GC-cadence-sensitive.
  *
  * Writes scale/session_floor_h<heapGiB>.json.
  * Run: `SPARK_DRIVER_MEM=8g tools/run.sh graft.tools.SessionFloor`
  */
object SessionFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-session-floor", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the twin's input, rebuilt once: 2 ntile tiles over (ts, user_id)
    // order + 2 sentinel batches pushing the watermark past every gap
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = (raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts",
          F.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }).select(F.col("user_id"), F.col("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(F.col("ts"), F.col("user_id"))
    val maxTs = ev.agg(F.max("ts")).head().getTimestamp(0)
    def sentinel(uid: Long, days: Long, tile: Int) =
      Seq((uid, new java.sql.Timestamp(maxTs.getTime + days * 86400000L), tile))
        .toDF("user_id", "ts", "__tile")
    val tiled = ev.withColumn("__tile", F.ntile(2).over(w))
      .unionByName(sentinel(-1L, 30, 3))
      .unionByName(sentinel(-2L, 31, 4))
      .localCheckpoint()
    val inDir = java.nio.file.Files.createTempDirectory("graft-sessfloor-in").toString
    (1 to 4).foreach { i =>
      val tmp = s"$inDir-tmp"
      tiled.filter(F.col("__tile") === i).drop("__tile")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      val dst = new java.io.File(inDir, f"b$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    final case class Run(sec: Double, gc: Long, trigger: Long, addBatch: Long,
      stateUpd: Long, stateRm: Long, stateCommit: Long)

    def measure(body: Option[DataFrame => Unit]): Run = {
      val cp = java.nio.file.Files
        .createTempDirectory("graft-sessfloor-cp").toString
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val gc0 = gcMs
      val t0 = System.nanoTime()
      val q = try {
        val src = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
        val out = body match {
          case None =>
            src.writeStream
              .option("checkpointLocation", cp)
              .foreachBatch { (b: DataFrame, _: Long) =>
                b.write.format("noop").mode("append").save(); ()
              }
          case Some(sink) =>
            graft.streaming.Streams
              .sessionize(src.as[graft.streaming.Streams.SessionEvent])
              .toDF("user_id", "n_events", "duration_us")
              .writeStream.outputMode("append")
              .option("checkpointLocation", cp)
              .foreachBatch { (b: DataFrame, _: Long) => sink(b); () }
        }
        val q = out.start()
        try q.processAllAvailable() finally q.stop()
        q
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val sec = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val progs = q.recentProgress.toSeq
      def dur(k: String) = progs.flatMap(p =>
        Option(p.durationMs.get(k)).map(_.longValue)).sum
      val ops = progs.flatMap(_.stateOperators.toSeq)
      Run(sec, gcMs - gc0, dur("triggerExecution"), dur("addBatch"),
        ops.map(_.allUpdatesTimeMs).sum, ops.map(_.allRemovalsTimeMs).sum,
        ops.map(_.commitTimeMs).sum)
    }

    def min2(label: String, body: Option[DataFrame => Unit]): Run = {
      scrub(); val a = measure(body)
      scrub(); val b = measure(body)
      val best = if (a.sec <= b.sec) a else b
      println(f"[sessfloor] $label%-8s ${best.sec}%6.2f s (runs ${a.sec}%.2f / ${b.sec}%.2f) " +
        f"gc=${best.gc}ms trigger=${best.trigger}ms state=${best.stateUpd + best.stateCommit}ms")
      best
    }

    val noop = min2("noop", None)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val session = min2("session", Some(b => { buf += b.count() }))
    val heapGb = Runtime.getRuntime.maxMemory / (1024L * 1024 * 1024)
    val json =
      f"""{"heap_gib":$heapGb,"noop_sec":${noop.sec}%.2f,"session_sec":${session.sec}%.2f,
         |"noop_gc_ms":${noop.gc},"session_gc_ms":${session.gc},
         |"session_trigger_ms":${session.trigger},"session_addbatch_ms":${session.addBatch},
         |"session_state_updates_ms":${session.stateUpd},"session_state_removals_ms":${session.stateRm},
         |"session_state_commit_ms":${session.stateCommit},
         |"note":"same 4-file replay, checkpoint, trigger, 8-wide shuffles as q_sessionize_stream; noop = file/trigger floor with no state store; difference = session-state work + GC"}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("scale"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"scale/session_floor_h$heapGb.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
