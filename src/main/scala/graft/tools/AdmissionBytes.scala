package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{functions => F}
import graft.GraftSession

/** Shuffle-byte A/B for the incremental-index admission join — the
  * evidence behind the r14 broadcast-probe redesign: per micro-batch,
  * insert-if-absent against a corpus-sized registry used to plan as a
  * key shuffle of BOTH sides (O(registry) bytes per batch); the probe
  * plan broadcasts the batch's keys into a semi-join against the
  * partition-pruned registry scan and the hits back into the anti-join,
  * so the registry is only SCANNED — zero shuffle bytes from the state
  * side, per batch, forever.
  *
  * Run: `tools/run.sh graft.tools.AdmissionBytes [registryRows] [batchRows]`
  * Prints one JSON line; copy the numbers into SCALE.md.
  */
object AdmissionBytes {
  def main(args: Array[String]): Unit = {
    val regRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val batchRows = args.drop(1).headOption.map(_.toLong).getOrElse(20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-admission-bytes", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val wh = java.nio.file.Files.createTempDirectory("graft-admission").toString
    val cat = new graft.sources.Catalog(spark, wh)
    val B = 16
    def rkOf(c: org.apache.spark.sql.Column) =
      F.pmod(F.xxhash64(c), F.lit(B.toLong)).cast("int")
    // the registry: regRows ids with dl/seq, id-hash partitioned
    cat.appendPartitioned("doc_lengths",
      spark.range(regRows).select(F.col("id").as("doc_id"),
        F.lit(40L).as("dl"), F.lit(0L).as("seq"), rkOf(F.col("id")).as("rk")),
      Seq("rk"))
    val dlSchema = graft.streaming.Bm25Index.dlSchema
    // the batch: half colliding ids, half fresh
    def batch = spark.range(regRows - batchRows / 2, regRows + batchRows / 2)
      .select(F.col("id").as("doc_id"), F.lit("t").as("text"))
      .dropDuplicates("doc_id").localCheckpoint()
    val b = batch
    def measure(name: String)(mk: => org.apache.spark.sql.DataFrame): String = {
      // warm once (JIT/codegen); bytes are deterministic either way
      mk.write.format("noop").mode("overwrite").save()
      bytes.set(0)
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let trailing stage events land
      val mib = bytes.get / 1048576.0
      println(f"[admission] $name%-10s $mib%8.2f MiB shuffled  $sec%6.2f s")
      f""""$name": {"shuffle_mib": $mib%.2f, "sec": $sec%.2f}"""
    }
    // at any real corpus size the registry exceeds the broadcast
    // threshold, so the legacy plan is the shuffle anti-join — emulate
    // that by disabling auto-broadcast for this arm (the probe arm's
    // explicit hints are unaffected by the conf)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val legacy = measure("shuffle") {
      graft.operators.Upsert.newRows(
        b, cat.readWithSchema("doc_lengths", dlSchema).select("doc_id"), "doc_id")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val probed = measure("probe") {
      val rks = b.select(rkOf(F.col("doc_id")).as("rk")).distinct()
        .collect().map(_.getInt(0)).toSeq
      graft.operators.Upsert.newRowsViaProbe(
        b,
        cat.readWithSchema("doc_lengths", dlSchema)
          .filter(F.col("rk").isin(rks: _*)).select("doc_id"),
        "doc_id")
    }
    println(s"""{"registry_rows": $regRows, "batch_rows": $batchRows, $legacy, $probed}""")
    spark.stop()
  }
}
