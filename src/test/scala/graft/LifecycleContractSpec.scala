package graft

import java.nio.file.Files
import org.apache.spark.sql.{functions => F}
import graft.sources.Catalog
import graft.streaming.{Bm25Index, OpLog, Streams}

/** The two lifecycle contracts every index family must honor:
  *
  *  - FIRST-OP SAFETY: delete / replace / compact must work as the
  *    FIRST operation ever run on a fresh family. Production
  *    maintenance is scheduled, not sequenced after ingest — a cron'd
  *    compaction or a takedown request can land before any stream has
  *    created the family's tables, and reading a never-created table
  *    throws PATH_NOT_FOUND (the r14 regression this spec pins against).
  *
  *  - SINGLE WRITER, ENFORCED: every op span (attempt → appends →
  *    commit) holds the family writer lease ([[OpLog.withWriter]],
  *    scope = the ops table — the same scope every maintenance pass
  *    takes), so a concurrent second writer or a maintenance rewrite
  *    racing an op refuses loudly with
  *    [[Catalog.MaintenanceLeaseHeld]] instead of interleaving: two
  *    writers deriving the same base from the op log would race
  *    beginAttempt on one seq, and a log rewrite would silently drop a
  *    commit row appended inside its stage→swap window.
  */
class LifecycleContractSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): Catalog =
    new Catalog(spark, Files.createTempDirectory("graft-lifecycle").toString)

  // ---------------------------------------------------------------- dedup

  test("dedup family: delete, replace, compact each work as the first-ever op") {
    // DELETE first: no victims, op committed, tables exist afterwards
    val c1 = freshCat()
    Streams.deleteDocsFromDedup(c1, "corpus", "corpus_tomb",
      Seq(1L, 2L).toDF("doc_id"))
    assert(c1.readWithSchema("corpus_tomb", Streams.dedupTombSchema).isEmpty,
      "deleting from an empty family tombstones nothing")
    // REPLACE first: the batch lands as a live generation
    val c2 = freshCat()
    Streams.replaceDocsInDedup(c2, "corpus", "buckets", "corpus_tomb",
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"))
    val live = graft.operators.Tombstones.live(
      c2.readWithSchema("corpus", Streams.dedupCorpusSchema),
      c2.readWithSchema("corpus_tomb", Streams.dedupTombSchema), "doc_id")
    assert(live.count() === 2L, "replace-as-first-op ingests the batch")
    // COMPACT first: pure no-op, no PATH_NOT_FOUND
    val c3 = freshCat()
    Streams.compactDocDedup(c3, "corpus", "buckets", "corpus_tomb")
    assert(c3.readWithSchema("corpus", Streams.dedupCorpusSchema).isEmpty)
  }

  // ---------------------------------------------------------------- vector

  test("vector family: delete, replace, compact each work as the first-ever op") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 12L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val (model, offline) = graft.operators.Similarity.ivfPqIndex(
      vecs, nlist = 4, m = 4, ksub = 8)
    val codesSchema = Streams.vectorCodesSchema(offline.schema)
    // DELETE first
    val c1 = freshCat()
    Streams.deleteVectors(c1, "codes", codesSchema, "codes_tomb",
      Seq(3L).toDF("neighbor_id"))
    assert(c1.readWithSchema("codes_tomb", Streams.vectorTombSchema).isEmpty)
    // REPLACE first: the batch lands as live codes
    val c2 = freshCat()
    Streams.replaceVectors(c2, "codes", codesSchema, "codes_tomb",
      vecs.limit(3), model, nlist = 4, m = 4, ksub = 8)
    val live = graft.operators.Tombstones.live(
      c2.readWithSchema("codes", codesSchema),
      c2.readWithSchema("codes_tomb", Streams.vectorTombSchema), "neighbor_id")
    assert(live.count() === 3L, "replace-as-first-op codes the batch")
    // COMPACT first
    val c3 = freshCat()
    Streams.compactVectorIndex(c3, "codes", codesSchema, "codes_tomb")
    assert(c3.readWithSchema("codes", codesSchema).isEmpty)
  }

  // ---------------------------------------------------------------- bm25

  test("bm25 family: delete, replace, compact each work as the first-ever op") {
    // DELETE first (no ensure() call — the op itself must materialize)
    val i1 = new Bm25Index(spark, freshCat())
    i1.delete(Seq(5L).toDF("doc_id"), 0L)
    assert(i1.serveBatch(Seq((1L, "any")).toDF("query_id", "term")).isEmpty)
    // REPLACE first: docs land and serve
    val i2 = new Bm25Index(spark, freshCat())
    i2.replace(Seq((1L, "spark spark engine"), (2L, "engine")).toDF("doc_id", "text"), 0L)
    val hits = i2.serve(Seq("spark"))
    assert(hits.select("doc_id").as[Long].collect().toSet === Set(1L),
      "replace-as-first-op must ingest and serve")
    // COMPACT first
    val i3 = new Bm25Index(spark, freshCat())
    i3.compact()
    assert(i3.serve(Seq("anything")).isEmpty)
  }

  // ----------------------------------------------------------- writer lease

  test("op spans hold the family writer lease: a concurrent foreign holder refuses loudly") {
    val dir = Files.createTempDirectory("graft-writer-lease").toString
    val cat = new Catalog(spark, s"$dir/wh")
    val foreign = new Catalog(spark, s"$dir/wh") // distinct holder id
    // seed the family so the refused op would otherwise have real work
    Streams.replaceDocsInDedup(cat, "corpus", "buckets", "corpus_tomb",
      Seq((1L, "alpha")).toDF("doc_id", "text"))
    foreign.withMaintenanceLease("corpus_ops") {
      // writer-vs-writer: every dedup op entry refuses while the scope is held
      intercept[Catalog.MaintenanceLeaseHeld] {
        Streams.deleteDocsFromDedup(cat, "corpus", "corpus_tomb",
          Seq(1L).toDF("doc_id"))
      }
      intercept[Catalog.MaintenanceLeaseHeld] {
        Streams.replaceDocsInDedup(cat, "corpus", "buckets", "corpus_tomb",
          Seq((1L, "omega")).toDF("doc_id", "text"))
      }
      // writer-vs-maintenance shares the same scope, so the log rewrite
      // arms (compact/checkpoint) refuse too — a commit row can never be
      // appended inside a rewrite's stage→swap window
      intercept[Catalog.MaintenanceLeaseHeld] {
        new OpLog(spark, cat, "corpus_ops", OpLog.countPayload).compact()
      }
      intercept[Catalog.MaintenanceLeaseHeld] {
        new OpLog(spark, cat, "corpus_ops", OpLog.countPayload).checkpoint()
      }
    }
    // window over: the identical op goes through and the doc dies
    Streams.deleteDocsFromDedup(cat, "corpus", "corpus_tomb",
      Seq(1L).toDF("doc_id"))
    assert(graft.operators.Tombstones.live(
      cat.readWithSchema("corpus", Streams.dedupCorpusSchema),
      cat.readWithSchema("corpus_tomb", Streams.dedupTombSchema),
      "doc_id").isEmpty)
  }

  test("bm25 op spans hold the writer lease; nested self re-entry still works") {
    val dir = Files.createTempDirectory("graft-bm25-lease").toString
    val cat = new Catalog(spark, s"$dir/wh")
    val idx = new Bm25Index(spark, cat)
    idx.ensure()
    val foreign = new Catalog(spark, s"$dir/wh")
    foreign.withMaintenanceLease("ops") {
      intercept[Catalog.MaintenanceLeaseHeld] {
        idx.ingest(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
      }
      intercept[Catalog.MaintenanceLeaseHeld] {
        idx.replace(Seq((1L, "gamma")).toDF("doc_id", "text"), 0L)
      }
      intercept[Catalog.MaintenanceLeaseHeld] {
        idx.delete(Seq(1L).toDF("doc_id"), 0L)
      }
      intercept[Catalog.MaintenanceLeaseHeld] { idx.compact() }
    }
    // the same catalog instance re-enters (maintenance calling op
    // helpers, op protocols calling log.compact): depth-counted, no
    // self-deadlock
    cat.withMaintenanceLease("ops") {
      idx.ingest(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    }
    assert(idx.serve(Seq("alpha")).count() === 1L)
  }

  test("lease re-entrancy is thread-scoped: a second thread through the SAME catalog refuses") {
    val dir = Files.createTempDirectory("graft-thread-lease").toString
    val cat = new Catalog(spark, s"$dir/wh")
    // mutual exclusion under real concurrency: 8 threads contend for one
    // scope through ONE Catalog instance; the instance-level depth count
    // must not let them all "re-enter" — at most one body runs at a time,
    // losers refuse loudly (they lose tryCreate against the live file)
    val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxConcurrent = new java.util.concurrent.atomic.AtomicInteger(0)
    val won = new java.util.concurrent.atomic.AtomicInteger(0)
    val refused = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        try {
          cat.withMaintenanceLease("scope") {
            val now = inBody.incrementAndGet()
            maxConcurrent.getAndUpdate(v => math.max(v, now))
            Thread.sleep(50)
            inBody.decrementAndGet()
          }
          won.incrementAndGet()
        } catch {
          case _: Catalog.MaintenanceLeaseHeld => refused.incrementAndGet()
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(won.get() >= 1, "at least one contender must acquire")
    assert(won.get() + refused.get() === 8, "every contender wins or refuses loudly")
    assert(maxConcurrent.get() === 1,
      s"bodies interleaved (${maxConcurrent.get()} concurrent) — thread-scoped re-entrancy broken")
    // same-thread nesting still re-enters freely
    cat.withMaintenanceLease("scope") {
      cat.withMaintenanceLease("scope") { assert(true) }
    }
  }

  // --------------------------------------------------------------- fencing

  test("a writer that overruns its lease TTL is fenced at commit, not interleaved") {
    val dir = Files.createTempDirectory("graft-fence").toString
    val cat = new Catalog(spark, s"$dir/wh")
    val foreign = new Catalog(spark, s"$dir/wh")
    val log = new OpLog(spark, cat, "ops", OpLog.countPayload)
    log.ensure()
    // overrun: a 1ms-TTL span sleeps past expiry, a contender breaks the
    // stale lease and runs its own span (then releases). The overrunner
    // must now refuse to publish: commit is the first fence point.
    intercept[Catalog.WriterFenced] {
      log.withWriter(ttlMs = 1L) {
        Thread.sleep(10)
        foreign.withMaintenanceLease("ops") { /* successor's window */ }
        log.commitCount(0L, 1L) // fenced: the lease no longer exists/is ours
      }
    }
    assert(log.committedSeqs.isEmpty,
      "the fenced writer must not have published a commit row")
    // the same overrun fences a maintenance swap (replaceTable path)
    cat.ensureTable("t", org.apache.spark.sql.types.StructType.fromDDL("a BIGINT"))
    intercept[Catalog.WriterFenced] {
      cat.withMaintenanceLease("t", ttlMs = 1L) {
        Thread.sleep(10)
        foreign.withMaintenanceLease("t") {}
        cat.replaceTable("t", Seq(1L).toDF("a"))
      }
    }
    // an in-TTL span commits normally (the fence is a no-op for a live lease)
    log.withWriter() { log.commitCount(1L, 1L) }
    assert(log.committedSeqs.count() === 1L)
    // the fence is THREAD-scoped: another thread's healthy span must not
    // be aborted by THIS thread's lapsed lease (two streams on different
    // families in one process fail independently)
    val otherLog = new OpLog(spark, cat, "ops_b", OpLog.countPayload)
    otherLog.ensure()
    @volatile var otherOk = false
    intercept[Catalog.WriterFenced] {
      cat.withMaintenanceLease("t", ttlMs = 1L) {
        Thread.sleep(10)
        foreign.withMaintenanceLease("t") {}
        val worker = new Thread(() => {
          otherLog.withWriter() { otherLog.commitCount(0L, 1L) }
          otherOk = true
        })
        worker.start(); worker.join()
        cat.replaceTable("t", Seq(2L).toDF("a")) // this thread IS fenced
      }
    }
    assert(otherOk, "a healthy writer on another thread was falsely fenced")
    assert(otherLog.committedSeqs.count() === 1L)
  }

  // ----------------------------------------------------------- layout stamp

  test("layout stamp: reopening a family with a different hash modulus refuses loudly") {
    val dir = Files.createTempDirectory("graft-layout").toString
    // bm25: bk/rk values are hash % buckets — a 32-bucket reopen of a
    // 16-bucket index would miss every stored row in the pruned scans
    val i16 = new Bm25Index(spark, new Catalog(spark, s"$dir/bm"), buckets = 16)
    i16.ingest(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    val i32 = new Bm25Index(spark, new Catalog(spark, s"$dir/bm"), buckets = 32)
    intercept[Catalog.LayoutMismatch] {
      i32.ingest(Seq((2L, "gamma")).toDF("doc_id", "text"), 1L)
    }
    // the original modulus reopens and keeps working
    val again = new Bm25Index(spark, new Catalog(spark, s"$dir/bm"), buckets = 16)
    again.ingest(Seq((2L, "gamma alpha")).toDF("doc_id", "text"), 1L)
    assert(again.serve(Seq("alpha")).count() === 2L)
    // dedup family: pbk bakes in stateBuckets the same way
    val dcat = new Catalog(spark, s"$dir/dd")
    Streams.replaceDocsInDedup(dcat, "corpus", "buckets", "corpus_tomb",
      Seq((1L, "alpha")).toDF("doc_id", "text"), stateBuckets = 16)
    intercept[Catalog.LayoutMismatch] {
      Streams.replaceDocsInDedup(dcat, "corpus", "buckets", "corpus_tomb",
        Seq((2L, "beta")).toDF("doc_id", "text"), stateBuckets = 32)
    }
  }

  test("layout stamp covers the LSH banding scheme, not just the hash modulus") {
    val dir = Files.createTempDirectory("graft-layout-lsh").toString
    // dedup: stored bucket rows' (band, bk) values are a function of
    // (shingleLen, numHashes, bands) — ingest at bands=4, reopen at
    // bands=8 would probe rows written under a different banding scheme
    // and silently admit near-duplicates of all prior content. Same
    // stateBuckets, so a modulus-only stamp would PASS here.
    val dcat = new Catalog(spark, s"$dir/dd")
    Streams.replaceDocsInDedup(dcat, "corpus", "buckets", "corpus_tomb",
      Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      numHashes = 64, bands = 4)
    intercept[Catalog.LayoutMismatch] {
      Streams.replaceDocsInDedup(dcat, "corpus", "buckets", "corpus_tomb",
        Seq((2L, "other words here")).toDF("doc_id", "text"),
        numHashes = 64, bands = 8)
    }
    intercept[Catalog.LayoutMismatch] {
      Streams.replaceDocsInDedup(dcat, "corpus", "buckets", "corpus_tomb",
        Seq((2L, "other words here")).toDF("doc_id", "text"),
        shingleLen = 3)
    }
    // the original scheme reopens and keeps serving
    Streams.replaceDocsInDedup(dcat, "corpus", "buckets", "corpus_tomb",
      Seq((2L, "second doc text")).toDF("doc_id", "text"),
      numHashes = 64, bands = 4)
    assert(graft.operators.Tombstones.live(
      dcat.readWithSchema("corpus", Streams.dedupCorpusSchema),
      dcat.readWithSchema("corpus_tomb", Streams.dedupTombSchema),
      "doc_id").count() === 2L)
    // vector: code rows bake in (nlist, m, ksub) — a reopen with a
    // different m would append codes of a different arity next to the
    // existing ones; same stateBuckets, so only the widened stamp trips
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 8L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val (model, offline) = graft.operators.Similarity.ivfPqIndex(
      vecs, nlist = 4, m = 4, ksub = 8)
    val codesSchema = Streams.vectorCodesSchema(offline.schema)
    val vcat = new Catalog(spark, s"$dir/vv")
    Streams.replaceVectors(vcat, "codes", codesSchema, "codes_tomb",
      vecs.limit(3), model, nlist = 4, m = 4, ksub = 8)
    intercept[Catalog.LayoutMismatch] {
      Streams.replaceVectors(vcat, "codes", codesSchema, "codes_tomb",
        vecs.limit(2), model, nlist = 4, m = 2, ksub = 8)
    }
  }
}
