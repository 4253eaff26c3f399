package graft.tools

import java.nio.file.{Files, Paths}
import graft.GraftSession
import graft.sources.{Catalog, CommitCoordinator}
import graft.streaming.{Bm25Index, Streams}

/** Child JVM for [[CoordThroughput]]'s cross-process concurrency
  * dividend: runs ONE index family's lifecycle ops (the same op mixes
  * as [[ConcurrencyDividend]]) in its own Spark JVM, coordinating
  * every lease/stamp/fence through one shared [[graft.sources.CoordServer]]
  * — the production multi-writer shape: independent writers in
  * separate processes, exclusion in the lock service. Reports its op
  * span as `opstart/opend` millis so the parent can compute serial
  * sums and concurrent walls without counting JVM+Spark boot time.
  *
  * Args: `<family dedup|bm25> <warehouseDir> <coordPort> <ops> <syncDir> <id>`.
  * Barrier: writes `ready_<id>` to syncDir, spins on `go`, then runs.
  */
object CoordDividendChild {
  def main(args: Array[String]): Unit = {
    val family = args(0)
    val wh = args(1)
    val port = args(2).toInt
    val ops = args(3).toInt
    val sync = args(4)
    val id = args(5)
    val spark = GraftSession.local(s"graft-coord-div-$id",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val coord = CommitCoordinator.remote("127.0.0.1", port)
    val cat = new Catalog(spark, wh, coord)

    // per-catalog op closure: bm25 materializes its ops table ONCE up
    // front (nextSeq reads it — ensure must precede the first op, for
    // the warm warehouse too), outside the measured span
    def opsFor(c: Catalog): Int => Unit = family match {
      case "dedup" =>
        i => Streams.replaceDocsInDedup(c, "corpus", "buckets", "tomb",
          Seq((i.toLong, s"doc $i body alpha beta gamma")).toDF("doc_id", "text"))
      case "bm25" =>
        val idx = new Bm25Index(spark, c)
        idx.ensure()
        i => idx.ingest(Seq((i.toLong, s"term$i alpha beta")).toDF("doc_id", "text"),
          idx.nextSeq)
      case other => sys.error(s"unknown family $other")
    }
    // warm one op of the family's shape so codegen/classloading is paid
    // before the barrier (both legs then measure coordination, not JIT)
    val warmCat = new Catalog(spark, s"$wh-warm", coord)
    opsFor(warmCat)(0)
    val oneOp = opsFor(cat)

    Files.writeString(Paths.get(sync, s"ready_$id"), "")
    val go = Paths.get(sync, "go")
    val deadline = System.currentTimeMillis() + 120000
    while (!Files.exists(go) && System.currentTimeMillis() < deadline)
      Thread.sleep(2)

    val t0 = System.currentTimeMillis()
    (1 to ops).foreach(oneOp)
    val t1 = System.currentTimeMillis()
    Files.writeString(Paths.get(sync, s"span_$id"), s"$t0 $t1")
    spark.stop()
  }
}
