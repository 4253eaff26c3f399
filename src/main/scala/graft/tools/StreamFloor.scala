package graft.tools

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.streaming.Trigger
import graft.GraftSession

/** Floor measurement for the streaming_dedup composite: replay the SAME
  * two-JSONL-file drop through the SAME file source, checkpoint, and
  * foreachBatch machinery, but with a no-op batch body — the difference
  * between this and the full composite is the actual dedup work; the
  * no-op time is the irreducible micro-batch floor (trigger scheduling,
  * file listing, offset log commits, JSON scan) that no operator change
  * can remove. Writes scale/stream_floor.json.
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-stream-floor", cpus)
    def text(seed: Long): String =
      (0 until 30).map(j => s"w${(seed * 1009 + j * 7919) % 99991}").mkString(" ")
    def measure(body: DataFrame => Unit): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft-floor").toString
      val drop = s"$dir/drop"
      new java.io.File(drop).mkdirs()
      Seq(("b0.jsonl", 0 until 1500), ("b1.jsonl", 1500 until 3000)).foreach {
        case (name, ids) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$drop/$name"),
            ids.map(i => s"""{"doc_id":$i,"text":"${text(i.toLong)}"}""").mkString("\n"))
      }
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.docFileStream(spark, drop, maxFilesPerTrigger = 1)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch((batch: DataFrame, _: Long) => body(batch))
        .start()
      try q.awaitTermination() finally q.stop()
      (System.nanoTime() - t0) / 1e9
    }
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // min-of-2 COLD runs: each attempt gets a fresh temp dir, so
    // first-run listing/codegen cost is present in both samples — the
    // floor measured here is the cold-replay floor the composite itself
    // pays (its attempts also run against fresh scratch dirs)
    def min2(label: String)(body: DataFrame => Unit): Double = {
      scrub(); val a = measure(body)
      scrub(); val b = measure(body)
      val t = math.min(a, b)
      println(f"[floor] $label%-14s $t%6.2f s (runs $a%.2f / $b%.2f)")
      t
    }
    val noop = min2("noop-batch")(b => { b.write.format("noop").mode("append").save(); () })
    val count = min2("count-batch")(b => { b.count(); () })
    val json =
      f"""{"noop_foreachbatch_sec": $noop%.2f, "count_foreachbatch_sec": $count%.2f, "note": "same 2-file drop, source, checkpoint, trigger as the streaming_dedup composite; difference to the composite = dedup work"}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("scale"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scale/stream_floor.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
