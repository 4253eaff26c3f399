package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import graft.GraftSession

/** Job-level profile of the bm25 streamed-ingest lifecycle (the
  * dominant phase of the q_bm25_stream family per DeleteTwinPhases):
  * replays the identical 3-op ingest with a SparkListener recording
  * every job's wall-clock and description, then prints the jobs sorted
  * by cost plus the wall vs sum-of-jobs gap — the split between "Spark
  * job time" (operator work) and "between-jobs time" (driver planning,
  * fs metadata, streaming trigger machinery) that decides WHICH
  * optimization applies.
  *
  * Run: tools/run.sh graft.tools.IngestProfile /root/testdata/sf0.1
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-ingest-profile", cpus)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val w = Window.orderBy(F.col("doc_id"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-profile-").toString
    val in = s"$root/in"
    // identical tiling to the graded twin
    new java.io.File(in).mkdirs()
    val tmp = s"$in-tmp"
    (1 to 3).foreach { i =>
      docs.withColumn("__tile", F.ntile(3).over(w))
        .filter(F.col("__tile") === i).drop("__tile")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .get
      val dst = new java.io.File(in, f"b$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    // warm one full lifecycle (codegen/classloading), unprofiled
    locally {
      val idx = new graft.streaming.Bm25Index(
        spark, new graft.sources.Catalog(spark, s"$root/warm_wh"))
      idx.ensure()
      val q = idx.writer(spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(in), s"$root/warm_cp").start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    System.gc()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name.takeWhile(_ != '\n')).getOrElse("?")
        jobs.put(js.jobId, (site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (desc, t0) =>
          done.synchronized { done += ((desc, (je.time - t0) / 1e3)) }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val idx = new graft.streaming.Bm25Index(
      spark, new graft.sources.Catalog(spark, s"$root/wh"))
    idx.ensure()
    val q = idx.writer(spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(in), s"$root/cp").start()
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    val byDesc = done.groupBy(_._1).map { case (d, xs) =>
      (d, xs.size, xs.map(_._2).sum)
    }.toSeq.sortBy(-_._3)
    println(f"\n=== ingest replay wall: $wall%.2f s; jobs: ${done.size}, " +
      f"sum(job wall): ${done.map(_._2).sum}%.2f s ===")
    byDesc.foreach { case (d, n, s) =>
      println(f"  $s%7.3f s  x$n%-3d  ${d.take(110)}")
    }
    // control: the SAME 3 ops driven directly (no streaming machinery) —
    // the delta to the stream replay is trigger/offset-log/source cost
    spark.catalog.clearCache()
    System.gc()
    val idx2 = new graft.streaming.Bm25Index(
      spark, new graft.sources.Catalog(spark, s"$root/wh2"))
    idx2.ensure()
    val tiles = new java.io.File(in).listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val t1 = System.nanoTime()
    // chronological job timeline of op 2 (tables warm): start offset,
    // duration, gap since previous job end, stage chain
    val timeline = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val tjobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val tl = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val names = js.stageInfos.sortBy(_.stageId)
          .map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        tjobs.put(js.jobId, (names, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(tjobs.remove(je.jobId)).foreach { case (n, s) =>
          timeline.synchronized { timeline += ((s, je.time, n)) }
        }
    }
    tiles.zipWithIndex.foreach { case (f, i) =>
      if (i == 2) spark.sparkContext.addSparkListener(tl)
      val b0 = System.nanoTime()
      idx2.ingest(spark.read.parquet(f.getPath), seq = i.toLong)
      println(f"  direct ingest op $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
    }
    println(f"=== direct 3-op ingest wall: ${(System.nanoTime() - t1) / 1e9}%.2f s ===")
    Thread.sleep(500)
    val sorted = timeline.sortBy(_._1)
    var prevEnd = sorted.headOption.map(_._1).getOrElse(0L)
    println("=== op 2 job timeline (dur ms, gap-before ms, stages) ===")
    sorted.foreach { case (s, e, n) =>
      println(f"  ${e - s}%5d  gap ${math.max(0, s - prevEnd)}%5d  ${n.take(140)}")
      prevEnd = math.max(prevEnd, e)
    }
    spark.stop()
  }
}
