package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.sources.Catalog
import graft.streaming.{Bm25Index, Streams}

/** The load-bearing proof for PER-PATH lease locks
  * ([[Catalog.leaseLock]], the r15 ADVICE #3 fix): two INDEPENDENT
  * index families ingesting through one process must actually proceed
  * in parallel — if the lease critical sections shared one monitor (the
  * pre-fix state), every unrelated lease acquire/release would
  * serialize and the concurrent run would collapse toward the serial
  * one. Measures the same op mix twice on fresh warehouses:
  *
  *  - SERIAL:     N dedup replace-ops, then N bm25 ingest+delete ops;
  *  - CONCURRENT: the two families on two threads, same op counts.
  *
  * Reports wall-clocks and the serial/concurrent ratio to
  * `scale/concurrency_dividend.json`. The ops are lifecycle-heavy
  * (lease + attempt + small write + commit per op) rather than
  * compute-heavy, so the measured overlap is the coordination layer's,
  * not the executor pool's. The in-spec twin
  * (LifecycleContractSpec "two families' leases never contend") pins
  * the semantics; this probe pins the DIVIDEND.
  *
  * Run: `tools/run.sh graft.tools.ConcurrencyDividend [ops]`.
  */
object ConcurrencyDividend {

  private def dedupOps(spark: SparkSession, cat: Catalog, n: Int): Unit = {
    import spark.implicits._
    (0 until n).foreach { i =>
      Streams.replaceDocsInDedup(cat, "corpus", "buckets", "tomb",
        Seq((i.toLong, s"doc $i body alpha beta gamma")).toDF("doc_id", "text"))
    }
  }

  private def bm25Ops(spark: SparkSession, cat: Catalog, n: Int): Unit = {
    import spark.implicits._
    val idx = new Bm25Index(spark, cat)
    idx.ensure() // nextSeq reads the ops table; materialize it first
    (0 until n).foreach { i =>
      idx.ingest(Seq((i.toLong, s"term$i alpha beta")).toDF("doc_id", "text"),
        idx.nextSeq)
    }
  }

  def main(args: Array[String]): Unit = {
    val ops = if (args.nonEmpty) args(0).toInt else 8
    // FAIR scheduling so neither thread's small jobs starve behind the
    // other's — the production multi-stream shape. Scheduler MODE is a
    // SparkConf setting fixed at context creation (a local property
    // would be a no-op), so set it via system property before the
    // session builds; each measured thread then names its own pool
    // below (undefined pools materialize with default weight, and
    // scheduling BETWEEN pools is fair — no XML needed).
    System.setProperty("spark.scheduler.mode", "FAIR")
    val spark = GraftSession.local("graft-conc-div",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    require(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR",
      "probe must measure the production FAIR shape")

    def fresh(): (Catalog, Catalog) = {
      val dir = Files.createTempDirectory("graft-conc").toString
      (new Catalog(spark, s"$dir/dd"), new Catalog(spark, s"$dir/bm"))
    }

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // warmup: one op of each shape so codegen/classloading is paid
    // outside both measured legs
    locally {
      val (d, b) = fresh()
      dedupOps(spark, d, 1); bm25Ops(spark, b, 1)
    }

    val tSerial = {
      val (d, b) = fresh()
      timed { dedupOps(spark, d, ops); bm25Ops(spark, b, ops) }
    }
    val tConc = {
      val (d, b) = fresh()
      timed {
        val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
        val t1 = new Thread(() =>
          try {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", "dedup")
            dedupOps(spark, d, ops)
          } catch { case e: Throwable => err.set(e) })
        val t2 = new Thread(() =>
          try {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", "bm25")
            bm25Ops(spark, b, ops)
          } catch { case e: Throwable => err.set(e) })
        t1.start(); t2.start(); t1.join(); t2.join()
        if (err.get != null) throw err.get
      }
    }
    val ratio = tSerial / tConc
    val json =
      f"""{"ops_per_family": $ops, "serial_sec": $tSerial%.2f, "concurrent_sec": $tConc%.2f, "ratio": $ratio%.2f, "note": "two independent families (dedup replace-ops, bm25 ingests) through one process; per-path lease locks let them overlap"}"""
    Files.createDirectories(Paths.get("scale"))
    Files.writeString(Paths.get("scale/concurrency_dividend.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
