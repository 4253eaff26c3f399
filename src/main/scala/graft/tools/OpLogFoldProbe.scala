package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{functions => F}
import graft.GraftSession

/** Measures the claim behind [[graft.streaming.OpLog.compact]]: an
  * uncompacted op log's read cost grows with TOTAL OPS EVER (two
  * one-row parquet files per op — listing + a footer each), and the
  * log is read several times per op, so history taxes every future
  * batch and serve. Isolation: the index is built with N ops and FULLY
  * compacted (data tables and log), the serve and one-more-ingest are
  * timed, then the log ALONE is re-fragmented with N zero-delta
  * committed ops (no data rows, additive stats sum unchanged — the
  * served plan is bit-identical) and the same two operations are timed
  * again; the delta is purely the log's file count. A final fold pins
  * the recovery. Local fs listing is far cheaper than an object
  * store's, so the measured ratio is a LOWER bound on the production
  * effect.
  *
  * Emits `scale/oplog_fold.json` (committed evidence, like the other
  * scale probes). Run:
  * `sbt "runMain graft.tools.OpLogFoldProbe 300"`.
  */
object OpLogFoldProbe {
  def main(args: Array[String]): Unit = {
    val ops = if (args.nonEmpty) args(0).toInt else 300
    val spark = GraftSession.local("graft-oplog-fold-probe", 8)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-oplog-probe").toString
    val cat = new graft.sources.Catalog(spark, s"$dir/wh")
    val idx = new graft.streaming.Bm25Index(spark, cat)
    idx.ensure()
    // the probe's own handle on the index's log — same table, same view
    val log = new graft.streaming.OpLog(spark, cat, "ops",
      graft.streaming.Bm25Index.statsPayload)

    def timeMin2(f: () => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def opsFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/wh/ops"))
        .count(_.getName.endsWith(".parquet"))
    }
    def serve(): Unit = idx.serve(Seq("alpha", "beta"), k = 10).collect()
    def ingestOne(base: Long): Unit = {
      val s = idx.nextSeq
      idx.ingest(Seq((base + s, "alpha fresh")).toDF("doc_id", "text"), s)
    }

    (0 until ops).foreach { i =>
      idx.ingest(Seq((i.toLong, s"alpha beta doc$i")).toDF("doc_id", "text"),
        seq = i.toLong)
      if (i % 50 == 49) println(s"[probe] ingested ${i + 1}/$ops ops")
    }
    idx.compact() // data tables AND log now compact — the baseline
    val filesFolded = opsFiles
    val serveFolded = timeMin2(() => serve())
    val ingestFolded = timeMin2(() => ingestOne(1000000L))

    // re-fragment ONLY the log: zero-delta committed ops add two
    // one-row files each and nothing else (no data rows; the additive
    // stats sum gains zero), so the served plan and result are
    // bit-identical to the folded baseline
    val zero = Seq((0L, 0L)).toDF("n_docs", "total_dl")
    (0 until ops).foreach { _ =>
      val s = log.nextBaseSeq
      log.beginAttempt(s); log.commit(s, zero)
    }
    val filesFrag = opsFiles
    val serveFrag = timeMin2(() => serve())
    val ingestFrag = timeMin2(() => ingestOne(2000000L))

    log.compact() // fold alone (data untouched) — recovery
    val filesRefolded = opsFiles
    val serveRefolded = timeMin2(() => serve())

    Files.createDirectories(Paths.get("scale"))
    val json =
      f"""{"ops": $ops, "files_folded": $filesFolded, "files_fragmented": $filesFrag, "files_refolded": $filesRefolded, "serve_sec_folded": $serveFolded%.3f, "serve_sec_fragmented": $serveFrag%.3f, "serve_sec_refolded": $serveRefolded%.3f, "ingest_sec_folded": $ingestFolded%.3f, "ingest_sec_fragmented": $ingestFrag%.3f}"""
    Files.writeString(Paths.get("scale/oplog_fold.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
