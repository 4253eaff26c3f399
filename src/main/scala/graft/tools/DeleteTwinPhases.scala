package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.GraftSession

/** Phase-timed replay of the q_bm25_stream_del lifecycle — the
  * adjudication harness for the r18 sf300 finding: the delete twin's
  * sf100→sf300 marginal exponent read 1.22-1.31 (the first
  * super-linear interval in any graded family) while the ingest twin
  * read 0.80 on the same data. The twin's wall-clock is a COMPOSITE
  * (base build + base copy + delete op + 2 re-ingest micro-batch ops +
  * physical compaction + serve), so a whole-query exponent cannot say
  * WHICH phase carries the step, and the working hypothesis (the
  * compact pass's per-task working set crossing the spill regime on
  * the fixed-heap local harness) predicts the step lives in exactly
  * one phase and flattens under heap proportional to data. This main
  * runs the identical lifecycle with a timer and a quiet gate
  * ([[HostProbe]], the bench's own busy probe) around every phase and
  * writes one JSON object per run, so exponents can be computed
  * per-phase across scale points and heap configs.
  *
  * Run: `SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.DeleteTwinPhases
  * localdata/sf100 scale/delete_phases_sf100_8g.json"` — heap via the
  * build's SPARK_DRIVER_MEM knob; the report records the JVM's actual
  * max heap so configs can't be mislabeled.
  */
object DeleteTwinPhases {

  private def scrub(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    System.gc()
  }

  private def copyDir(src: String, dst: String): Unit = {
    val sp = java.nio.file.Paths.get(src)
    val dp = java.nio.file.Paths.get(dst)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(sp).iterator().asScala.foreach { p =>
      val t = dp.resolve(sp.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  private def writeOrderedStreamFiles(
      tiled: DataFrame, parts: Int, outDir: String): Unit = {
    new java.io.File(outDir).mkdirs()
    val tmp = s"$outDir-tmp"
    (1 to parts).foreach { i =>
      tiled.filter(F.col("__tile") === i).drop("__tile")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      val dst = new java.io.File(outDir, f"b$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(tmp))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "localdata/sf100"
    val outPath = if (args.length > 1) args(1) else "scale/delete_phases.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-delete-phases", cpus)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", "8") // as the graded twin runs

    val quietBudget = new java.util.concurrent.atomic.AtomicLong(
      sys.env.getOrElse("SPARK_GRAFT_QUIET_BUDGET_MS", "120000").toLong)
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val busy = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def phase[T](name: String)(body: => T): T = {
      scrub(spark)
      HostProbe.awaitQuiet(quietBudget)
      busy(name) = HostProbe.busyFraction()
      val t0 = System.nanoTime()
      val r = body
      phases(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft-delete-phases-").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val w = Window.orderBy(F.col("doc_id"))

    // phase 1: the streamed 3-op base build (the fixture the graded
    // twin restores; built fresh here so its cost is its own line)
    phase("base_build") {
      val in = s"$root/in"; val cp = s"$root/cp"
      writeOrderedStreamFiles(
        docs.withColumn("__tile", F.ntile(3).over(w)), 3, in)
      val idx = new graft.streaming.Bm25Index(
        spark, new graft.sources.Catalog(spark, s"$root/base_wh"))
      idx.ensure()
      val q = idx.writer(spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(in), cp).start()
      try q.processAllAvailable() finally q.stop()
    }

    // phase 2: restore a private copy (exactly what the graded twin pays)
    val wh = s"$root/wh"
    phase("base_copy") { copyDir(s"$root/base_wh", wh) }

    val idx = new graft.streaming.Bm25Index(
      spark, new graft.sources.Catalog(spark, wh))

    // phase 3: the delete op — tombstones + one negative stats row
    phase("delete_op") {
      idx.delete(docs.filter(F.col("doc_id") % 7 === 3).select("doc_id"),
        seq = 10L)
    }

    // phase 4: re-ingest the modified half as 2 micro-batch ops
    phase("stream_ops") {
      val in2 = s"$root/in2"; val cp2 = s"$root/cp2"
      val modified = docs.filter(F.col("doc_id") % 14 === 3)
        .select(F.col("doc_id"),
          F.concat(F.col("text"), F.lit(" hash scan")).as("text"))
      writeOrderedStreamFiles(
        modified.withColumn("__tile", F.ntile(2).over(w)), 2, in2)
      val q2 = idx.writer(spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(in2), cp2).start()
      try q2.processAllAvailable() finally q2.stop()
    }

    // phase 5: physical compaction (tombstones applied in
    // partition-local rewrites) + op-log history fold
    phase("compact") {
      idx.compact(maxFilesPerPartition = 2, checkpointOps = true)
    }

    // phase 6: snapshot-pinned serve off the folded log
    val served = phase("serve") {
      idx.serve(Seq("hash", "scan", "merge"), k = 20).collect()
    }
    require(served.length == 20, s"serve returned ${served.length} rows")

    val bytes = {
      val f = new java.io.File(s"$dir/documents.parquet")
      if (f.isDirectory) f.listFiles().map(_.length()).sum else f.length()
    }
    val json =
      s"""{"dir":"$dir","bytes":$bytes,""" +
      s""""heap_max_gb":${Runtime.getRuntime.maxMemory / (1L << 30)},""" +
      s""""cpus":$cpus,""" +
      s""""phases":{${phases.map { case (k, v) => s""""$k":${f"$v%.2f"}""" }.mkString(",")}},""" +
      s""""busy":{${busy.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString(",")}},""" +
      s""""total":${f"${phases.values.sum}%.2f"}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
