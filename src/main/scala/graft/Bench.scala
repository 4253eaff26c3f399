package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through a `noop` sink write — unlike `count()`,
  * which lets Catalyst prune the whole projection away, noop computes
  * every output column while writing nothing.
  *
  * Session hygiene (r8 finding): a shared session accumulates cached
  * blocks and localCheckpoint RDDs across ~125 entries, taxing
  * late-alphabet entries 3-4× their isolated cost. Between measured
  * runs (outside the timer) the harness clears the SQL cache and
  * unpersists every lingering RDD; the three end-to-end composites
  * (pipeline / streaming / streaming_dedup) each get a fresh
  * SparkSession on a fresh SparkContext so micro-batch state never
  * inherits the query sweep's block-manager residue.
  */
object Bench {
  /** Release cross-entry session state: cached relations plus any
    * persistent RDDs (localCheckpoint blocks otherwise linger in
    * executor storage until driver GC — the r8 tail-contamination
    * mechanism).
    */
  private def scrub(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    // ContextCleaner only reclaims shuffle files / broadcast blocks when
    // their owners are GARBAGE-COLLECTED; between measurements (outside
    // every timer) force the collection so an entry never pays for its
    // predecessors' accumulated shuffle state — the residue that taxes
    // whichever composite happens to run last in the shared session
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    def freshSession(name: String): SparkSession = {
      val s = GraftSession.builder(name, cpus)
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      GraftFunctions.register(s)
      s
    }
    val spark = freshSession("graft-bench")
    // Warm up the JVM/codegen/parquet paths once so the first measured
    // query doesn't absorb classloading + first-codegen cost.
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    // Optional filter: bench only the named queries (space/comma separated).
    val only = args.flatMap(_.split("[,\\s]+")).filter(_.nonEmpty).toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(kv => only(kv._1)).toSeq.sortBy(_._1)
    // Steady-state warmup: run every selected query once against the
    // smallest sibling scale factor (when present) so measurements
    // reflect warmed whole-stage codegen and classloading rather than
    // first-run JIT — the measured directory's data stays untouched, so
    // its I/O remains cold and honestly measured.
    val warmDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    if (warmDir.isDirectory && warmDir.getPath != new java.io.File(sfDir).getPath) {
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir.getPath).write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(_) => () }
      }
      scrub(spark)
    }
    // Two measured runs per query, report the faster: single-run local
    // timings are ±20% noisy (GC, page cache), which round-over-round
    // reads as phantom regressions; min-of-N is the standard estimator
    // for the repeatable cost of a deterministic computation.
    val results = selected.map { case (name, fn) =>
      // a failed run must NOT report its (fast) elapsed time as the
      // query's benchmark — NaN poisons the min so the failure is
      // visible, and the report carries an explicit failed list
      def once(): Double = {
        // outside the timer: start every run with a clean block manager
        // so an entry's cost never includes (or hides behind) another
        // entry's lingering cached/checkpointed blocks
        scrub(spark)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Double.NaN
        }
      }
      name -> math.min(once(), once())
    }
    // The composites below share ONE fresh SparkSession on a fresh
    // SparkContext (local mode allows one context per JVM, so the query
    // sweep's session stops first): their micro-batch/pipeline timings
    // must not inherit the sweep's block-manager and GC residue, but
    // they may — and should — share each other's warmed codegen and
    // classloading (the r9 finding: six cold session bootstraps taxed
    // the composite block more than the measured work itself). Each
    // composite keeps the min-of-2 estimator — the first run absorbs
    // cold JIT/codegen (checkpoint-heavy streaming flows swing 2-3x
    // between cold and warm), every attempt on fresh scratch dirs; the
    // sweep-style scrub between attempts keeps attempts independent.
    spark.stop()
    val compositeSession = freshSession("graft-bench-composites")
    def min2(attempt: SparkSession => Double): Double = {
      def once(): Double = {
        scrub(compositeSession)
        attempt(compositeSession)
      }
      val a = once()
      val b = once()
      if (a.isNaN || b.isNaN) Double.NaN else math.min(a, b)
    }
    // The reference's ACTUAL workload, timed end-to-end: three pipeline
    // batches (CSV ingest -> trip_key derivation -> date-pruned dedup
    // upsert -> incremental matview refresh; the middle batch repeats
    // the first, so its upsert is pure dedup work; the third overlaps
    // 50%), then small-file compaction of the accreted partitions.
    val withPipeline =
      if (only.nonEmpty && !only("pipeline")) results
      else results :+ ("pipeline" -> min2(s => {
        val dir = java.nio.file.Files.createTempDirectory("graft-bench-pipe").toString
        def csv(name: String, rows: Int, offset: Int): String = {
          val p = s"$dir/$name.csv"
          java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
            graft.tools.TripPipelineDemo.syntheticCsv(rows, offset,
              tsHeader = "date_time"))
          p
        }
        val b1 = csv("b1", 20000, 0)
        val b2 = csv("b2", 20000, 10000)
        val t0 = System.nanoTime()
        try {
          val pipe = new Pipeline(s, s"$dir/warehouse")
          pipe.runBatch(b1)
          pipe.runBatch(b1) // idempotent re-run: all-duplicate batch
          pipe.runBatch(b2) // 50% fresh keys
          pipe.compactHist(maxFilesPerPartition = 1)
          (System.nanoTime() - t0) / 1e9
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] pipeline failed: ${e.getMessage}")
          Double.NaN
        }
      }))
    // The streaming path, timed: three files dropped up front, consumed
    // as three micro-batches (maxFilesPerTrigger=1) through the
    // file-drop source -> keyed dedup-upsert flow (S8) — the continuous
    // form of the pipeline entry above, sharing its batch operators.
    val withStreaming =
      if (only.nonEmpty && !only("streaming")) withPipeline
      else withPipeline :+ ("streaming" -> min2(s => {
        val dir = java.nio.file.Files.createTempDirectory("graft-bench-stream").toString
        val drop = s"$dir/drop"
        new java.io.File(drop).mkdirs()
        (0 until 3).foreach { i =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$drop/b$i.csv"),
            graft.tools.TripPipelineDemo.syntheticCsv(20000, i * 10000,
              tsHeader = "date_time"))
        }
        val t0 = System.nanoTime()
        try {
          val catalog = new graft.sources.Catalog(s, s"$dir/warehouse")
          catalog.ensureTable("hist_trip_data", graft.model.Trip.schema)
          val q = graft.streaming.Streams.streamingUpsert(
            graft.streaming.Streams.tripFileStream(s, drop, maxFilesPerTrigger = 1),
            catalog, "hist_trip_data", s"$dir/ckpt").start()
          // stop in finally: a failed micro-batch must not leave the
          // stream's listing/microbatch threads competing with whatever
          // the bench measures next
          try q.processAllAvailable()
          finally q.stop()
          (System.nanoTime() - t0) / 1e9
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] streaming failed: ${e.getMessage}")
          Double.NaN
        }
      }))
    // Streaming incremental dedup, timed end-to-end: two JSONL batches
    // (the second re-drops 30% of the first's texts under new ids) flow
    // through the file-drop source -> persisted-bucket-table candidate
    // probe -> exact-Jaccard verify -> corpus+bucket append. The corpus
    // admitted in earlier micro-batches is never re-shingled; the
    // cross-batch property (a later batch's dups resolving against the
    // PERSISTED index, not a re-derivation) needs one batch boundary,
    // and each extra micro-batch only re-times the trigger machinery.
    val withStreamDedup =
      if (only.nonEmpty && !only("streaming_dedup")) withStreaming
      else withStreaming :+ ("streaming_dedup" -> min2(s => {
        val dir = java.nio.file.Files.createTempDirectory("graft-bench-sdedup").toString
        val drop = s"$dir/drop"
        new java.io.File(drop).mkdirs()
        // deterministic word-salad texts over a 99991-word vocabulary;
        // the word sequence is an arithmetic progression determined by
        // seed mod 99991, and all seeds (< 3000) are distinct residues —
        // so the ONLY duplicates are the intended dupFrom re-drops
        def text(seed: Long): String =
          (0 until 30).map(j => s"w${(seed * 1009 + j * 7919) % 99991}").mkString(" ")
        def batchFile(name: String, ids: Range, dupFrom: Long => Long): Unit = {
          val lines = ids.map { i =>
            s"""{"doc_id":$i,"text":"${text(dupFrom(i.toLong))}"}"""
          }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$drop/$name"), lines.mkString("\n"))
        }
        batchFile("b0.jsonl", 0 until 1500, identity)
        batchFile("b1.jsonl", 1500 until 3000,
          i => if (i % 10 < 3) i - 1500 else i) // 30% dups of b0
        val t0 = System.nanoTime()
        try {
          val catalog = new graft.sources.Catalog(s, s"$dir/warehouse")
          val ddl = org.apache.spark.sql.types.StructType.fromDDL _
          catalog.ensureTable("corpus", ddl("doc_id BIGINT, text STRING"))
          catalog.ensureTable("corpus_buckets", ddl("id BIGINT, band INT, bk BIGINT"))
          val q = graft.streaming.Streams.streamingDocDedup(
            graft.streaming.Streams.docFileStream(s, drop, maxFilesPerTrigger = 1),
            catalog, "corpus", "corpus_buckets", s"$dir/ckpt").start()
          try q.processAllAvailable()
          finally q.stop()
          (System.nanoTime() - t0) / 1e9
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] streaming_dedup failed: ${e.getMessage}")
          Double.NaN
        }
      }))
    compositeSession.stop()
    val failed = withStreamDedup.collect { case (k, v) if v.isNaN => k }
    val qs = withStreamDedup.map { case (k, v) =>
      "\"" + k + "\":" + (if (v.isNaN) "-1" else f"$v%.3f")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = withStreamDedup.map(_._2).filterNot(_.isNaN).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // Durable copy: the driver captures only the stdout TAIL, which has
    // truncated the first ~90 per-query timings in past rounds. The
    // engine persists its own complete report (per-query min-of-2 plus
    // the config that produced it) at the REPO ROOT — a tracked path, so
    // each round's complete numbers land in history instead of a
    // gitignored target/ dir or a scrollback buffer.
    // (filtered spot-runs skip the durable write — a partial report must
    // never shadow the round's full one)
    if (only.isEmpty) {
      val full =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","cpus":$cpus,"entries":${withStreamDedup.size},"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_full.json"), full + "\n")
    }
  }
}
