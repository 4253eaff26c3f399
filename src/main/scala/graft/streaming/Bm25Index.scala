package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types.StructType
import graft.operators.{Retrieval, Tombstones, Upsert}
import graft.sources.Catalog

/** Incrementally-maintained BM25 inverted index with full
  * DELETE/REPLACE semantics — the production-truthful form of the
  * append-only q_bm25_stream twin. The reference's own write path is
  * replace-semantics (`ON CONFLICT` upsert, populate_postgres.sql:14-28);
  * a corpus index must mirror it: documents get re-crawled, taken down,
  * and replaced constantly, and an index that can only append keeps
  * scoring ghosts forever.
  *
  * Tables (all under one [[graft.sources.Catalog]] warehouse):
  *  - `postings(term, doc_id, tf, dl, seq)` hive-partitioned by `bk`
  *    (term-hash bucket): the index in production layout. `dl` rides
  *    INLINE on every posting ([[Retrieval.postingsWithDl]]) so serving
  *    never joins a corpus-sized sidecar; `seq` is the generation stamp
  *    tombstones cut against.
  *  - `doc_lengths(doc_id, dl, seq)` hive-partitioned by `rk` (id-hash
  *    bucket): the document REGISTRY — admission authority for
  *    insert-if-absent and the delete path's dl lookup. Never read at
  *    serve time. The partitioning keeps maintenance rewrites (scrub,
  *    tombstone application) local to the partitions actually holding
  *    affected rows, the same discipline as the postings table.
  *  - `tombstones(doc_id, seq)`: logical deletes
  *    ([[graft.operators.Tombstones]]); anti-joined at serve, applied
  *    physically and cleared at [[compact]]. Flat — bounded by deletes
  *    since the last compaction.
  *  - `ops(seq, n_docs, total_dl)`: the [[OpLog]]. The commit row
  *    carries the op's ADDITIVE global-stats contribution (ingests
  *    +n/+Σdl, deletes −n/−Σdl), so the serve's global (n_docs,
  *    total_dl) is a sum over this |ops|-row table instead of an
  *    O(corpus) registry scan.
  *
  * Exactly-once and replay: the [[OpLog]] protocol (attempt marker →
  * scrub-then-redo → atomic commit-with-stats; see its scaladoc for why
  * probe-and-skip is unsound under partial multi-file append commits).
  * All reads — admission, victim selection, serving — are COMMITTED
  * generations only, so a crashed half-written op is invisible
  * everywhere until its replay commits. That also makes seq assignment
  * self-managing: [[writer]] derives its base from the op log's
  * high-water mark (one |ops|-row probe), so a restarted stream — from
  * its checkpoint or from scratch — can never collide with a committed
  * op (which would silently drop the batch) nor be confused by an
  * abandoned attempt's partial rows. Abandoned-attempt garbage is
  * scrubbed at [[compact]].
  *
  * Scale shape of an ingest: admission is the broadcast-probe upsert
  * ([[graft.operators.Upsert.newRowsProbed]]) against the registry
  * PRUNED to the batch's id-hash partitions — the state side is
  * scanned (one pruned key column), never shuffled; the op's appends
  * are batch-sized. A serve: bucket-partition pruning (the query
  * terms' `bk` values) → parquet row-group `term IN` pruning → a
  * df-bounded pivot, with global stats from the |ops|-row log and the
  * tombstone anti-join broadcast (bounded by deletes since last
  * compaction). Nothing corpus-sized is scanned or shuffled on either
  * path.
  */
final class Bm25Index(
    spark: SparkSession,
    cat: Catalog,
    buckets: Int = 64,
    k1: Double = 1.2,
    b: Double = 0.75,
    // admission batches above this many keys fall back from the
    // broadcast probe to the shuffle anti-join (backfill-sized batches
    // genuinely want the shuffle)
    maxProbeIds: Long = 4L * 1024 * 1024) {
  import Bm25Index._

  private val log = new OpLog(spark, cat, "ops", statsPayload)

  def ensure(): Unit = {
    cat.ensurePartitionedTable("postings", postSchema, Seq("bk"))
    cat.ensurePartitionedTable("doc_lengths", dlSchema, Seq("rk"))
    cat.ensureTable("tombstones", tombSchema)
    // bk/rk partition values bake in `buckets` (hash(x) % buckets):
    // reopening an index with a different modulus would silently miss
    // every stored row in the pruned admission/serve scans — persist
    // the layout stamp and refuse a mismatch loudly (LayoutMismatch).
    // Row-shaping parameter audit: `buckets` is the only constructor
    // knob baked into stored rows. Tokenization (Retrieval.postings'
    // split regex) shapes stored terms but is CODE, not a parameter —
    // the literal "v2" is its version; any tokenizer change must bump
    // it. k1/b/maxProbeIds are serve/admission-time only: stored rows
    // carry raw tf/dl, so rescoring under different k1/b is legitimate.
    cat.ensureLayoutMeta("postings", s"bm25 v2 buckets=$buckets")
    log.ensure()
  }

  private def postings: DataFrame = cat.readWithSchema("postings", postSchema)
  private def registry: DataFrame = cat.readWithSchema("doc_lengths", dlSchema)
  private def tombs: DataFrame = cat.readWithSchema("tombstones", tombSchema)

  /** Unconditional crash-window healing, run at EVERY op/serve entry
    * before any table is probed or read. Two windows it closes, both
    * fatal if a probe ran first:
    *  - a crash inside a partitioned compaction's swap (between
    *    move-aside and move-in) leaves a partition's only copy in the
    *    staging dir; scrubOp's per-seq probe would then see no rows
    *    for the crashed seq, skip the scrub, and the redo's append
    *    would recreate the partition dir — after which the next
    *    compaction's staging delete destroys the orphaned committed
    *    rows of OTHER ops permanently;
    *  - a crash inside the tombstone table's replaceTable (between
    *    move-aside and swap-in) leaves the live dir missing, and every
    *    subsequent read throws path-not-found before any code path
    *    would reach recovery — wedging the pipeline.
    * Both recoveries are idempotent fs-metadata probes (no jobs), so
    * running them per op is noise next to the op's own work. */
  private def heal(lenient: Boolean = false): Unit = {
    // `lenient` for READ entries (serve/serveBatch): an in-flight
    // publish's swap marker means nothing is crashed — skip rather than
    // throw SwapInFlight (write entries stay strict: appending under a
    // marker would poison the crash-heal's manifest comparison). The
    // marker also protects a live writer's staging from this very heal
    // — the pre-r17 racing-heal abort, closed.
    cat.recoverCompaction("postings", "bk", lenient)
    cat.recoverCompaction("doc_lengths", "rk", lenient)
    cat.recoverReplace("tombstones", lenient)
  }

  /** Crashed-replay rollback: remove EVERY row the crashed attempt may
    * have written (its `seq` stamp) from the data tables, so the redo
    * appends against a clean slate (see [[OpLog]] for why
    * scrub-then-redo, not probe-and-skip). Each scrub probes which
    * partitions hold the seq (bounded: ≤ `buckets` values) and
    * rewrites exactly those; the flat tombstone table goes through the
    * crash-safe [[graft.sources.Catalog.replaceTable]]. */
  private def scrubOp(seq: Long): Unit = {
    cat.scrubSeqs("postings", "bk", postSchema, Seq(seq))
    cat.scrubSeqs("doc_lengths", "rk", dlSchema, Seq(seq))
    if (!tombs.filter(F.col("seq") === seq).isEmpty)
      cat.replaceTable("tombstones", tombs.filter(F.col("seq") =!= seq))
  }

  private def bucketOf = F.pmod(F.xxhash64(F.col("term")), F.lit(buckets.toLong))
    .cast("int")

  /** Writer width for clustered partitioned appends: the session's
    * shuffle width capped at the bucket count (hashing by the bucket
    * column alone can never fill more tasks than there are buckets). */
  private def writeWidth: Int = math.min(
    spark.conf.get("spark.sql.shuffle.partitions").toInt, buckets)

  private def rkOf = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(buckets.toLong))
    .cast("int")

  /** The LIVE registry as of the committed ops: committed generations
    * minus committed tombstones. Uncommitted (crashed / in-flight)
    * rows never influence admission or victim selection — the property
    * that makes replay-under-a-new-seq converge.
    *
    * Pinned to the op's ONE log snapshot (valid under the single-writer
    * lease — nothing commits mid-op): visibility is literal seq
    * filters pushed into the parquet scans instead of a broadcast
    * anti-join against a live openSeqs subquery, which cost every op
    * two extra ops-table scans and their AQE broadcast stages. */
  private def liveRegistry(snap: OpLog.Snapshot): DataFrame =
    Tombstones.live(snap.visible(registry), snap.visible(tombs))

  /** Ingest one batch of (doc_id, text) as op `seq` — the foreachBatch
    * body. Insert-if-absent against the LIVE registry: an id currently
    * live is dropped (the reference's DO NOTHING arm); a deleted id
    * re-ingests as a fresh generation (the replace arm). Exactly-once
    * under replay (see class doc).
    */
  def ingest(batch: DataFrame, seq: Long): Unit = log.withWriter() {
    // the op's full span — heal, replay probe, appends, commit — runs
    // as THE single writer of the family: a concurrent writer (racing
    // beginAttempt on the same derived seq) or a concurrent log
    // rewrite (which would discard a commit row appended inside its
    // stage→swap window) refuses loudly instead of interleaving
    heal()
    ensure()
    // one |ops|-row collect answers replay flags AND all visibility for
    // the whole op (single-writer lease: the captured prefix stays
    // current through the op's own appends)
    val snap = log.snapshot()
    val (done, crashed) = snap.replayState(seq)
    if (done) return
    log.beginAttempt(seq)
    if (crashed) scrubOp(seq)
    // both admission questions — the batch's id-hash partition values
    // (≤ `buckets` ints — prunes the registry scan) and its key count
    // (guards the broadcast probe) — RIDE the checkpoint
    // materialization as observed metrics instead of costing their own
    // job (guide §1.2: the op used to pay ~15 tiny jobs; every fused
    // aggregate is one fewer dispatch)
    val probeObs = org.apache.spark.sql.Observation()
    val deduped = batch
      .select(F.col("doc_id").cast("long").as("doc_id"), F.col("text"))
      // duplicate ids within one batch resolve to the lexicographically
      // greatest text — an arbitrary but DETERMINISTIC winner
      // (dropDuplicates keeps whichever row a partition scan meets
      // first, which need not repeat across a crash replay)
      .groupBy("doc_id").agg(F.max("text").as("text"))
      .observe(probeObs,
        F.collect_set(rkOf).as("rks"), F.count(F.lit(1)).as("n"))
      .localCheckpoint() // reused: admission + appends
    val probe = probeObs.get
    val rks = probe("rks").asInstanceOf[Seq[Any]]
    val pruned = liveRegistry(snap).filter(F.col("rk").isin(rks: _*)).select("doc_id")
    // the commit stats RIDE the admission checkpoint as observed
    // metrics (the observe node sits in the checkpoint action's result
    // stage — exactly-once under task retries, unlike an observe below
    // a write's repartition exchange) — the old 1-row agg job
    // re-tokenized `admitted` a third time
    val statsObs = org.apache.spark.sql.Observation()
    val admitted = (
        if (probe("n").asInstanceOf[Long] > maxProbeIds)
          Upsert.newRows(deduped, pruned, "doc_id")
        else Upsert.newRowsViaProbe(deduped, pruned, "doc_id"))
      .observe(statsObs,
        F.count(F.lit(1)).as("n_docs"),
        F.coalesce(F.sum(Retrieval.dlOf(F.col("text"))), F.lit(0L))
          .as("total_dl"))
      .localCheckpoint() // referenced by both appends below
    val dls = Retrieval.docLengths(admitted).withColumn("seq", F.lit(seq))
    cat.appendPartitioned("postings",
      Retrieval.postingsWithDl(admitted)
        .withColumn("seq", F.lit(seq)).withColumn("bk", bucketOf),
      Seq("bk"), clusterInto = Some(writeWidth), sortWithin = Seq("term"))
    cat.appendPartitioned("doc_lengths", dls.withColumn("rk", rkOf), Seq("rk"),
      clusterInto = Some(writeWidth))
    val st = statsObs.get
    log.commitValues(seq, Seq(
      Some(st("n_docs").asInstanceOf[Long]),
      Some(st("total_dl").asInstanceOf[Long])))
  }

  /** Delete documents by id as op `seq`: tombstone the LIVE generations
    * and count them out of the additive stats (the commit row carries
    * the NEGATIVE contribution). Ids not currently live are ignored
    * (deleting twice, or deleting a never-ingested id, is a no-op).
    * Exactly-once under replay; pass [[nextSeq]] when the caller does
    * not manage its own sequence.
    */
  def delete(ids: DataFrame, seq: Long): Unit = log.withWriter() {
    heal()
    ensure()
    val snap = log.snapshot()
    val (done, crashed) = snap.replayState(seq)
    if (done) return
    log.beginAttempt(seq)
    if (crashed) scrubOp(seq)
    // the rk probe rides the id-set checkpoint as an observed metric
    // (one fewer job; the observe sits in the checkpoint's result stage)
    val rkObs = org.apache.spark.sql.Observation()
    val idsD = ids.select(F.col("doc_id").cast("long").as("doc_id"))
      .dropDuplicates("doc_id")
      .observe(rkObs, F.collect_set(rkOf).as("rks"))
      .localCheckpoint() // reused: victim join + (lazily) nothing else
    // prune the registry scan to the delete set's id-hash partitions
    // (≤ `buckets` values); join strategy is left to AQE — a takedown
    // batch is usually broadcast-sized but need not be
    val rks = rkObs.get("rks").asInstanceOf[Seq[Any]]
    // the NEGATIVE commit stats ride the victim checkpoint the same way
    val statsObs = org.apache.spark.sql.Observation()
    val victims = liveRegistry(snap).filter(F.col("rk").isin(rks: _*))
      .join(idsD, Seq("doc_id"), "leftsemi")
      .observe(statsObs,
        F.count(F.lit(1)).as("n"),
        F.coalesce(F.sum("dl"), F.lit(0L)).as("sdl"))
      .localCheckpoint() // referenced by the append below
    cat.append("tombstones",
      victims.select(F.col("doc_id"), F.lit(seq).as("seq")))
    val st = statsObs.get
    log.commitValues(seq, Seq(
      Some(-st("n").asInstanceOf[Long]),
      Some(-st("sdl").asInstanceOf[Long])))
  }

  /** The next free op seq — one |ops|-row probe. */
  def nextSeq: Long = { heal(); log.nextBaseSeq }

  /** REPLACE one batch of (doc_id, text) as ONE exactly-once op — the
    * reference's `ON CONFLICT DO UPDATE` arm in a single statement.
    * Every batch doc lands as generation `seq`; any batch id currently
    * live is simultaneously tombstoned AT `seq`, which kills its older
    * generations but not the op's own rows (tombstones kill strictly
    * OLDER generations — [[graft.operators.Tombstones]]). One attempt
    * marker, one commit row carrying the NET additive stats delta
    * (+new docs +new dl −killed docs −killed dl), so the
    * delete+re-ingest choreography the del twin runs as TWO ops
    * collapses to one: half the op-log traffic, no window where the
    * old generation is gone and the new one not yet committed — a
    * crashed replace is invisible in FULL, not per-half. Replays
    * converge by the standard scrub-then-redo.
    */
  def replace(batch: DataFrame, seq: Long): Unit = log.withWriter() {
    heal()
    ensure()
    val snap = log.snapshot()
    val (done, crashed) = snap.replayState(seq)
    if (done) return
    log.beginAttempt(seq)
    if (crashed) scrubOp(seq)
    // the rk probe and the ADDED-side stats ride the batch checkpoint
    // as observed metrics; the KILLED-side stats ride the victim
    // checkpoint — the old form paid three extra jobs (probe, added
    // agg, killed agg via the commit's 1-row head). Every observe sits
    // in its checkpoint action's result stage (exactly-once).
    val addObs = org.apache.spark.sql.Observation()
    val deduped = batch
      .select(F.col("doc_id").cast("long").as("doc_id"), F.col("text"))
      .groupBy("doc_id").agg(F.max("text").as("text"))
      .observe(addObs,
        F.collect_set(rkOf).as("rks"),
        F.count(F.lit(1)).as("an"),
        F.coalesce(F.sum(Retrieval.dlOf(F.col("text"))), F.lit(0L)).as("adl"))
      .localCheckpoint() // reused: victims + appends
    val add = addObs.get
    val rks = add("rks").asInstanceOf[Seq[Any]]
    // the batch ids' currently-live generations: these die at `seq`
    // (their dl leaves the global stats); the probe shape is the same
    // zero-state-shuffle admission plan, semi instead of anti
    val killObs = org.apache.spark.sql.Observation()
    val victims = liveRegistry(snap).filter(F.col("rk").isin(rks: _*))
      .join(F.broadcast(deduped.select("doc_id")), Seq("doc_id"), "leftsemi")
      .observe(killObs,
        F.count(F.lit(1)).as("kn"),
        F.coalesce(F.sum("dl"), F.lit(0L)).as("kdl"))
      .localCheckpoint() // referenced by tombstone append
    val dls = Retrieval.docLengths(deduped).withColumn("seq", F.lit(seq))
    cat.appendPartitioned("postings",
      Retrieval.postingsWithDl(deduped)
        .withColumn("seq", F.lit(seq)).withColumn("bk", bucketOf),
      Seq("bk"), clusterInto = Some(writeWidth), sortWithin = Seq("term"))
    cat.appendPartitioned("doc_lengths", dls.withColumn("rk", rkOf), Seq("rk"),
      clusterInto = Some(writeWidth))
    cat.append("tombstones",
      victims.select(F.col("doc_id"), F.lit(seq).as("seq")))
    // ONE commit row carries the net delta: adds minus kills
    val kill = killObs.get
    log.commitValues(seq, Seq(
      Some(add("an").asInstanceOf[Long] - kill("kn").asInstanceOf[Long]),
      Some(add("adl").asInstanceOf[Long] - kill("kdl").asInstanceOf[Long])))
  }

  /** A continuous ingestion stream: each micro-batch runs [[ingest]]
    * (or, with `replaceMode`, [[replace]] — the RECRAWL stream: a
    * re-fetched page overwrites its live generation instead of being
    * dropped as already-present) at `base + batchId`, where `base` is
    * DERIVED from the op log's high-water mark at writer
    * construction — so a restarted stream (from its checkpoint or from
    * scratch) can never collide with a committed op. A caller-supplied
    * `baseSeq` is validated loudly against the same mark instead of
    * silently no-opping every batch. Replayed in-flight batches run
    * under the new base's seq and converge via committed-only reads
    * (class doc).
    *
    * Replace-mode tombstone cadence: every batch tombstones its live
    * victims, so a recrawl-heavy stream accretes tombstones at the
    * recrawl rate until [[compact]] applies and clears them —
    * [[graft.operators.Tombstones.live]] degrades from broadcast to a
    * shuffle join past its size guard, so an overdue compaction costs
    * throughput, never correctness. Compact on a cadence proportional
    * to the replace rate. */
  def writer(
      docs: DataFrame,
      checkpoint: String,
      baseSeq: Option[Long] = None,
      replaceMode: Boolean = false): DataStreamWriter[Row] = {
    heal()
    val base = baseSeq.map(log.requireFreshBase).getOrElse(log.nextBaseSeq)
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (replaceMode) replace(batch, base + id)
        else ingest(batch, base + id)
      }
  }

  /** Top-k BM25 over the CURRENT live corpus, served purely from the
    * index — bit-equal to [[Retrieval.bm25TopK]] over the equivalent
    * batch corpus (same exact-integer inputs, same
    * [[Retrieval.bm25Score]] Column tree). Reads committed generations
    * only, and SNAPSHOT-ISOLATED across the whole call: one pinned
    * [[OpLog.snapshot]] answers visibility (postings AND tombstones)
    * and the global (n_docs, total_dl) sum, so a commit landing
    * mid-serve can never skew this read's scoring constant against its
    * document set — every serve scores exactly one committed prefix
    * (spec-pinned at score granularity in SwapConsistencySpec). */
  def serve(terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "serve needs at least one query term")
    heal(lenient = true)
    val snap = log.snapshot()
    // the query terms' bucket ids — same hash the writer used, so
    // pruning can never disagree with placement; one 1-row collect
    val bkRow = spark.range(1).select(terms.map(t =>
      F.pmod(F.xxhash64(F.lit(t)), F.lit(buckets.toLong)).cast("int").as(t)): _*)
      .head()
    val bks = terms.indices.map(bkRow.getInt).distinct
    val hits = Tombstones.live(
      snap.visible(postings
        .filter(F.col("bk").isin(bks: _*) && F.col("term").isin(terms: _*))),
      snap.visible(tombs))
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      F.coalesce(F.sum(F.when(F.col("term") === t, F.col("tf"))), F.lit(0L))
        .as(s"tf$i")
    }
    val base = hits.groupBy("doc_id")
      .agg(tfAggs.head, (tfAggs.tail :+ F.max("dl").as("dl")): _*)
      .select(F.col("doc_id") +: F.col("dl") +:
        terms.indices.map(i => F.col(s"tf$i")): _*)
    val dfAggs = Retrieval.termDfAggs(terms)
    val dfs = hits.agg(dfAggs.head, dfAggs.tail: _*)
    // global stats = the additive op-log sum over the SAME pinned
    // snapshot that decided visibility (attempt rows are null and
    // contribute nothing) — a local relation, not a second table scan
    val global = snap.rows
      .agg(F.coalesce(F.sum("n_docs"), F.lit(0L)).as("n_docs"),
        F.coalesce(F.sum("total_dl"), F.lit(0L)).as("total_dl"))
      .crossJoin(dfs) // 1-row × 1-row scalar spine
    Retrieval.bm25Score(base, global, terms.size, k1, b, k)
  }

  /** Top-k BM25 for a BATCH of queries — production retrieval serves
    * query batches, not one literal term set. `queries` is a bounded
    * (query_id, term) frame; the pruned postings are scanned ONCE for
    * all queries and every query-sized set broadcasts:
    *  1. partition-prune the postings scan to the batch's term-hash
    *     buckets (one tiny collect, ≤ `buckets` values) and semi-join
    *     it against the broadcast term set — the index side is never
    *     shuffled;
    *  2. per-term df is a |terms|-row aggregate of those live rows,
    *     broadcast back; global (n_docs, total_dl) is the |ops|-row
    *     log sum;
    *  3. each (query term × live posting) hit carries its BM25
    *     contribution — the identical IEEE expression tree as
    *     [[Retrieval.bm25Score]] — and a doc's score folds the
    *     contributions in ASCENDING TERM ORDER (array_sort + aggregate,
    *     a deterministic left fold), so the sum never reassociates
    *     across partitions and stays bit-reproducible;
    *  4. rank is a per-query window (score desc, doc_id), top-k each.
    * Returns (query_id, doc_id, score, rank).
    */
  def serveBatch(queries: DataFrame, k: Int = 20): DataFrame = {
    heal(lenient = true)
    // one pinned committed-prefix snapshot for the whole batch: every
    // query in the batch scores against the SAME committed state
    // (visibility and global stats can never mix adjacent commits)
    val snap = log.snapshot()
    val q = queries
      .select(F.col("query_id").cast("long").as("query_id"), F.col("term"))
      .dropDuplicates("query_id", "term")
      .localCheckpoint() // reused: bk probe + term set + hit join
    val bks = q.select(F.pmod(F.xxhash64(F.col("term")), F.lit(buckets.toLong))
        .cast("int").as("bk")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val qterms = q.select("term").distinct()
    val live = Tombstones.live(
      snap.visible(postings.filter(F.col("bk").isin(bks: _*))
        .join(F.broadcast(qterms), Seq("term"), "leftsemi")),
      snap.visible(tombs))
    // one live row per (term, doc): df = per-term row count
    val dfs = live.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val global = snap.rows
      .agg(F.coalesce(F.sum("n_docs"), F.lit(0L)).as("n_docs"),
        F.coalesce(F.sum("total_dl"), F.lit(0L)).as("total_dl"))
    val hits = live.join(F.broadcast(q), Seq("term"))
      .join(F.broadcast(dfs), Seq("term"))
      .crossJoin(F.broadcast(global))
    val n = F.col("n_docs")
    val avgdl = F.col("total_dl").cast("double") / n
    val idf = (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    val contrib = idf * (F.col("tf") * F.lit(k1 + 1)) /
      (F.col("tf") + F.lit(k1) *
        (F.lit(1 - b) + F.lit(b) * (F.col("dl") / avgdl)))
    val scored = hits
      .select(F.col("query_id"), F.col("doc_id"), F.col("term"),
        contrib.as("c"))
      .groupBy("query_id", "doc_id")
      .agg(F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("term"), F.col("c")))),
        F.lit(0.0), (acc, x) => acc + x("c")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("score").desc, F.col("doc_id"))
    scored
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Maintenance: physically apply the COMMITTED tombstones and scrub
    * abandoned-attempt garbage (rewriting exactly the partitions
    * holding affected rows, plus any partition over the small-file
    * threshold), then clear exactly the tombstones that were applied.
    * On a clean index all of that degenerates to pure small-file
    * compaction — no no-op table rewrites. Serve-transparent by
    * construction: the logical live-filter over the pre-compaction
    * layout and the physical layout afterwards describe the same rows.
    * Tombstones of UNCOMMITTED ops that may still replay (at the op
    * log's high-water mark) are left untouched.
    */
  def compact(
      maxFilesPerPartition: Int = 2,
      checkpointOps: Boolean = false): Unit = {
    heal()
    // doc_lengths is id-hash-partitioned (rk = hash(doc_id) % buckets,
    // `buckets` stamp-verified at every open), so its affected
    // partitions derive driver-side from the tombstone ids — zero probe
    // jobs. postings' bk is a TERM hash, not derivable from ids: it
    // keeps the probe scan.
    Generations.compact(cat, log, "tombstones", tombSchema, "doc_id",
      Seq(Generations.Stamped("postings", "bk", postSchema, "doc_id"),
        Generations.Stamped("doc_lengths", "rk", dlSchema, "doc_id",
          partOfId = Some(Generations.idHashPartition(buckets)))),
      maxFilesPerPartition, checkpointLog = checkpointOps)
  }
}

object Bm25Index {
  val postSchema: StructType = StructType.fromDDL(
    "term STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, seq BIGINT, bk INT")
  val dlSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, dl BIGINT, seq BIGINT, rk INT")
  val tombSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, seq BIGINT")
  val statsPayload: StructType = StructType.fromDDL(
    "n_docs BIGINT, total_dl BIGINT")
  val opsSchema: StructType = StructType.fromDDL(
    "seq BIGINT, n_docs BIGINT, total_dl BIGINT")
}
