package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types.StructType
import graft.operators.{Retrieval, Tombstones}
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
  *  - `doc_lengths(doc_id, dl, seq)`: the document REGISTRY — admission
  *    authority for insert-if-absent and the delete path's dl lookup.
  *    Never read at serve time.
  *  - `tombstones(doc_id, seq)`: logical deletes
  *    ([[graft.operators.Tombstones]]); anti-joined at serve, applied
  *    physically and cleared at [[compact]].
  *  - `ops(seq, n_docs, total_dl)`: the op LOG, carrying three duties in
  *    one |ops|-row table. An ATTEMPT row `(seq, null, null)` lands
  *    before an op's first data append; the COMMIT row carries the op's
  *    ADDITIVE global-stats contribution (ingests +n/+Σdl, deletes
  *    −n/−Σdl), so committing the op and recording its stats is ONE
  *    atomic append — there is no window where stats and marker
  *    disagree — and the serve's global (n_docs, total_dl) is a sum
  *    over this table instead of an O(corpus) registry scan.
  *
  * Exactly-once under micro-batch replay: a clean op sees no attempt
  * row and appends directly (no probe or scrub jobs on the happy
  * path); a replay of a CRASHED attempt sees the attempt row and
  * SCRUBS every row carrying the op's `seq` before redoing the
  * appends. Scrub-then-redo rather than probe-and-skip because a
  * multi-file append job is not atomic under a crash during job commit
  * (a subset of task files can land) — presence of some of an op's
  * rows does not prove presence of all. A committed seq
  * short-circuits entirely. This closes the r12 advisory: the sink is
  * exactly-once under foreachBatch retry, including commit-window
  * partial appends.
  *
  * Op sequencing contract: `seq` is strictly monotone across ops
  * (streams stamp `baseSeq + batchId`; a RESTARTED stream gets a fresh
  * `baseSeq` above everything committed) and ops execute in seq order —
  * exactly Structured Streaming's replay discipline. Serves read only
  * COMMITTED generations, so a crashed half-written op is invisible
  * until its replay completes.
  *
  * Scale shape of a serve: bucket-partition pruning (the query terms'
  * `bk` values) → parquet row-group `term IN` pruning → a df-bounded
  * pivot, with global stats from the |ops|-row log and the tombstone
  * anti-join broadcast (bounded by deletes since last compaction).
  * Nothing corpus-sized is scanned — the fix for r12's bm25FromIndex
  * dl-sidecar wart.
  */
final class Bm25Index(
    spark: SparkSession,
    cat: Catalog,
    buckets: Int = 64,
    k1: Double = 1.2,
    b: Double = 0.75) {
  import Bm25Index._

  def ensure(): Unit = {
    cat.ensurePartitionedTable("postings", postSchema, Seq("bk"))
    cat.ensureTable("doc_lengths", dlSchema)
    cat.ensureTable("tombstones", tombSchema)
    cat.ensureTable("ops", opsSchema)
  }

  private def postings: DataFrame = cat.readWithSchema("postings", postSchema)
  private def registry: DataFrame = cat.readWithSchema("doc_lengths", dlSchema)
  private def tombs: DataFrame = cat.readWithSchema("tombstones", tombSchema)
  private def ops: DataFrame = cat.readWithSchema("ops", opsSchema)

  /** Unconditional crash-window healing, run at EVERY op/serve entry
    * before any table is probed or read. Two windows it closes, both
    * fatal if a probe ran first:
    *  - a crash inside a postings compaction's swap (between move-aside
    *    and move-in) leaves a bucket partition's only copy in the
    *    staging dir; scrubOp's per-seq bk probe would then see no rows
    *    for the crashed seq, skip the scrub, and the redo's append
    *    would recreate the partition dir — after which the next
    *    compaction's staging delete destroys the orphaned committed
    *    rows of OTHER ops permanently;
    *  - a crash inside a registry/tombstone replaceTable (between
    *    move-aside and swap-in) leaves the live dir missing, and every
    *    subsequent read throws path-not-found before any code path
    *    would reach recovery — wedging the pipeline.
    * Both recoveries are idempotent fs-metadata probes (no jobs), so
    * running them per op is noise next to the op's own work. */
  private def heal(): Unit = {
    cat.recoverCompaction("postings", "bk")
    cat.recoverReplace("doc_lengths")
    cat.recoverReplace("tombstones")
  }

  /** Commit rows only (attempt rows carry null stats). */
  private def committed: DataFrame =
    ops.filter(F.col("n_docs").isNotNull)

  /** One probe for both replay flags: ≤ |attempts-for-this-seq|+1 tiny
    * rows answer "already committed?" and "did a prior attempt crash?"
    * in a single job. */
  private def opState(seq: Long): (Boolean, Boolean) = {
    val rows = ops.filter(F.col("seq") === seq).select("n_docs").collect()
    (rows.exists(!_.isNullAt(0)), rows.nonEmpty)
  }

  /** Attempt marker, written BEFORE an op's first data append: on the
    * happy path (no marker) no prior attempt can have written anything,
    * so the per-table [[hasSeq]] probes are skipped entirely. Duplicate
    * attempt rows from replays are harmless (existence-only, null
    * stats). */
  private def beginAttempt(seq: Long): Unit =
    cat.append("ops", oneRow(Row(seq, null, null), opsSchema))

  /** Commit = the op's additive stats row, one atomic append. `stats`
    * must be a 1-row (n_docs, total_dl) frame. */
  private def commitOp(seq: Long, stats: DataFrame): Unit =
    cat.append("ops",
      stats.select(F.lit(seq).as("seq"),
        F.col("n_docs").cast("long").as("n_docs"),
        F.col("total_dl").cast("long").as("total_dl")))

  /** Crashed-replay rollback: remove EVERY row the crashed attempt may
    * have written (its `seq` stamp) from the data tables, so the redo
    * appends against a clean slate. This is deliberately NOT a
    * probe-and-skip (`does the table already hold this seq?`): a
    * multi-file append job is not atomic under a crash DURING job
    * commit — the committer can have moved a subset of task files into
    * the table — so presence of some rows does not prove presence of
    * all, and skipping on a partial append would silently lose the
    * rest. Scrub-then-redo is idempotent under repeated crashes (a
    * partial scrub just leaves fewer rows for the next scrub) and runs
    * ONLY on replays whose attempt marker says a prior attempt may have
    * written. Postings scrub rewrites exactly the bucket partitions
    * holding the seq (bounded probe, partition-local rewrite); the
    * sidecars are |corpus-registry|- and |tombstone|-sized flat tables
    * behind the crash-safe [[graft.sources.Catalog.replaceTable]]. */
  private def scrubOp(seq: Long): Unit = {
    val bks = postings.filter(F.col("seq") === seq)
      .select("bk").distinct().collect().map(_.getInt(0).toString).toSeq
    if (bks.nonEmpty)
      cat.compactPartitioned("postings", "bk", postSchema,
        maxFilesPerPartition = Int.MaxValue,
        transform = df => df.filter(F.col("seq") =!= seq),
        forceValues = bks)
    if (!registry.filter(F.col("seq") === seq).isEmpty)
      cat.replaceTable("doc_lengths", registry.filter(F.col("seq") =!= seq))
    if (!tombs.filter(F.col("seq") === seq).isEmpty)
      cat.replaceTable("tombstones", tombs.filter(F.col("seq") =!= seq))
  }

  private def oneRow(row: Row, schema: StructType): DataFrame =
    spark.createDataFrame(java.util.List.of(row), schema)

  private def bucketOf = F.pmod(F.xxhash64(F.col("term")), F.lit(buckets.toLong))
    .cast("int")

  /** The state as of BEFORE op `seq` — rows of this very op excluded, so
    * a crash replay recomputes the identical admitted/victim set no
    * matter which appends already landed. */
  private def preOp(df: DataFrame, seq: Long): DataFrame =
    df.filter(F.col("seq") < seq)

  /** Ingest one batch of (doc_id, text) as op `seq` — the foreachBatch
    * body. Insert-if-absent against the LIVE registry: an id currently
    * live is dropped (the reference's DO NOTHING arm); a deleted id
    * re-ingests as a fresh generation (the replace arm). Exactly-once
    * under replay (see class doc).
    */
  def ingest(batch: DataFrame, seq: Long): Unit = {
    heal()
    val (done, crashed) = opState(seq)
    if (done) return
    beginAttempt(seq)
    if (crashed) scrubOp(seq)
    val liveReg = Tombstones.live(preOp(registry, seq), preOp(tombs, seq))
    val admitted = batch
      .select(F.col("doc_id").cast("long").as("doc_id"), F.col("text"))
      // duplicate ids within one batch resolve to the lexicographically
      // greatest text — an arbitrary but DETERMINISTIC winner
      // (dropDuplicates keeps whichever row a partition scan meets
      // first, which need not repeat across a crash replay)
      .groupBy("doc_id").agg(F.max("text").as("text"))
      .join(liveReg.select("doc_id"), Seq("doc_id"), "leftanti")
      .localCheckpoint() // referenced by all three appends below
    val dls = Retrieval.docLengths(admitted).withColumn("seq", F.lit(seq))
    cat.appendPartitioned("postings",
      Retrieval.postingsWithDl(admitted)
        .withColumn("seq", F.lit(seq)).withColumn("bk", bucketOf),
      Seq("bk"))
    cat.append("doc_lengths", dls)
    commitOp(seq, dls.agg(
      F.count(F.lit(1)).as("n_docs"),
      F.coalesce(F.sum("dl"), F.lit(0L)).as("total_dl")))
  }

  /** Delete documents by id as op `seq`: tombstone the LIVE generations
    * and count them out of the additive stats (the commit row carries
    * the NEGATIVE contribution). Ids not currently live are ignored
    * (deleting twice, or deleting a never-ingested id, is a no-op).
    * Exactly-once under replay.
    */
  def delete(ids: DataFrame, seq: Long): Unit = {
    heal()
    val (done, crashed) = opState(seq)
    if (done) return
    beginAttempt(seq)
    if (crashed) scrubOp(seq)
    val victims = Tombstones.live(preOp(registry, seq), preOp(tombs, seq))
      .join(ids.select(F.col("doc_id").cast("long").as("doc_id"))
        .dropDuplicates("doc_id"), Seq("doc_id"), "leftsemi")
      .localCheckpoint() // referenced by both appends below
    cat.append("tombstones",
      victims.select(F.col("doc_id"), F.lit(seq).as("seq")))
    commitOp(seq, victims.agg(
        F.count(F.lit(1)).as("n"),
        F.coalesce(F.sum("dl"), F.lit(0L)).as("sdl"))
      .select((-F.col("n")).as("n_docs"), (-F.col("sdl")).as("total_dl")))
  }

  /** A continuous ingestion stream: each micro-batch runs [[ingest]] at
    * `baseSeq + batchId`. A restarted stream (fresh checkpoint) must be
    * given a `baseSeq` above every committed seq. */
  def writer(
      docs: DataFrame,
      checkpoint: String,
      baseSeq: Long): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingest(batch, baseSeq + id)
      }

  /** Top-k BM25 over the CURRENT live corpus, served purely from the
    * index — bit-equal to [[Retrieval.bm25TopK]] over the equivalent
    * batch corpus (same exact-integer inputs, same
    * [[Retrieval.bm25Score]] Column tree). Reads committed generations
    * only. */
  def serve(terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "serve needs at least one query term")
    heal()
    // the query terms' bucket ids — same hash the writer used, so
    // pruning can never disagree with placement; one 1-row collect
    val bkRow = spark.range(1).select(terms.map(t =>
      F.pmod(F.xxhash64(F.lit(t)), F.lit(buckets.toLong)).cast("int").as(t)): _*)
      .head()
    val bks = terms.indices.map(bkRow.getInt).distinct
    // the op log is |ops|-row — every join against it is a broadcast
    // semi, never a shuffle
    val commitSeqs = committed.select("seq")
    val committedTombs =
      tombs.join(F.broadcast(commitSeqs), Seq("seq"), "leftsemi")
    val hits = Tombstones.live(
      postings
        .filter(F.col("bk").isin(bks: _*) && F.col("term").isin(terms: _*))
        .join(F.broadcast(commitSeqs), Seq("seq"), "leftsemi"),
      committedTombs)
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
    // global stats = the additive op-log sum; attempt rows are null and
    // contribute nothing
    val global = ops
      .agg(F.coalesce(F.sum("n_docs"), F.lit(0L)).as("n_docs"),
        F.coalesce(F.sum("total_dl"), F.lit(0L)).as("total_dl"))
      .crossJoin(dfs) // 1-row × 1-row scalar spine
    Retrieval.bm25Score(base, global, terms.size, k1, b, k)
  }

  /** Maintenance: physically apply the COMMITTED tombstones (rewrite
    * exactly the bucket partitions holding dead generations, plus any
    * partition over the small-file threshold), rewrite the registry
    * minus dead rows, and clear the applied tombstones. On a
    * tombstone-free index all of that degenerates to pure small-file
    * compaction — no no-op table rewrites. Serve-transparent by
    * construction: the logical live-filter over the pre-compaction
    * layout and the physical layout afterwards describe the same rows.
    * Tombstones of UNCOMMITTED ops (a crashed delete awaiting replay)
    * are left untouched so the replay still sees its pre-op state.
    */
  def compact(maxFilesPerPartition: Int = 2): Unit = {
    heal()
    val committedTombs = tombs
      .join(F.broadcast(committed.select("seq")), Seq("seq"), "leftsemi")
      .localCheckpoint() // small; referenced by probe + transform + clear
    val haveTombs = !committedTombs.isEmpty
    // partitions holding dead rows: a bounded probe (≤ `buckets` values)
    val deadBks =
      if (!haveTombs) Nil
      else postings
        .join(F.broadcast(Tombstones.lastSeq(committedTombs)), Seq("doc_id"))
        .filter(F.col("seq") <= F.col("__tomb_seq"))
        .select("bk").distinct().collect().map(_.getInt(0).toString).toSeq
    cat.compactPartitioned("postings", "bk", postSchema,
      maxFilesPerPartition = maxFilesPerPartition,
      transform =
        if (haveTombs) df => Tombstones.live(df, committedTombs)
        else identity,
      forceValues = deadBks)
    if (haveTombs) {
      cat.replaceTable("doc_lengths",
        Tombstones.live(registry, committedTombs))
      cat.replaceTable("tombstones",
        tombs.join(committed.select("seq"), Seq("seq"), "leftanti"))
    }
  }
}

object Bm25Index {
  val postSchema: StructType = StructType.fromDDL(
    "term STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, seq BIGINT, bk INT")
  val dlSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, dl BIGINT, seq BIGINT")
  val tombSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, seq BIGINT")
  val opsSchema: StructType = StructType.fromDDL(
    "seq BIGINT, n_docs BIGINT, total_dl BIGINT")
}
