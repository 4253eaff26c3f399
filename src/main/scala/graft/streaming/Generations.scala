package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types.StructType
import graft.operators.Tombstones
import graft.sources.Catalog

/** Maintenance for a generation-stamped index family (the BM25
  * postings/registry pair, the dedup corpus/bucket pair, the IVF-PQ
  * codes table): physically apply the COMMITTED tombstones and scrub
  * abandoned-attempt garbage ([[OpLog.garbageSeqs]]), rewriting ONLY
  * the hive partitions that hold affected rows, then clear exactly the
  * tombstone snapshot that was applied.
  *
  * Partition-local by construction: each table's affected partitions
  * are derived DRIVER-SIDE from the collected tombstone ids when the
  * table is id-hash-partitioned ([[Stamped.partOfId]] — zero probe
  * jobs), or probed (bounded by the partition count) when the
  * partition key is not a function of the id (the BM25 postings'
  * term-hash buckets); [[graft.sources.Catalog.compactPartitioned]]
  * rewrites those plus any partition over the small-file threshold —
  * untouched partitions' files are byte-identical afterwards
  * (spec-pinned). At 100 TB a maintenance pass that dropped 0.1% dead
  * rows by rewriting the whole corpus table would be the wrong plan;
  * this one's cost tracks the affected partitions.
  *
  * The tombstone clear is an ANTI-JOIN against the applied snapshot,
  * not a truncate: a tombstone appended by a concurrent delete between
  * the snapshot and the clear survives un-applied (it keeps filtering
  * logically at serve and is applied by the next compaction) instead of
  * being silently discarded — which would resurrect the deleted doc.
  *
  * Serve-transparent: the logical live-filter over the pre-compaction
  * layout and the physical layout afterwards describe the same rows.
  * Tombstones of UNCOMMITTED ops that may still replay (at the op
  * log's high-water mark) are left untouched. Assumes the single-writer
  * maintenance discipline (no compaction concurrent with another
  * compaction of the same family).
  *
  * Job shape (guide §1.2/§2.4/§2.6 — this pass used to be the single
  * biggest fixed cost inside the lifecycle twins): ONE |ops|-row
  * snapshot collect + ONE tombstone-table collect answer every
  * driver-side question (replay state, garbage seqs, per-table forced
  * partitions for id-hash tables, the applied set the clear anti-joins
  * against — the tombstone set is bounded by deletes since the last
  * compaction, the same bound that lets serve broadcast it, so the
  * driver copy costs what the broadcast build already did); the
  * per-table rewrites run CONCURRENTLY (2-3 staged jobs in flight,
  * guide §2.6, under lease delegation so fencing still applies); and
  * the closing op-log fold is computed from the already-collected
  * snapshot instead of re-scanning the log.
  */
object Generations {

  /** One table of a stamped family: hive-partitioned on `partCol`, id
    * column `idCol` (what tombstones kill by), generation column `seq`.
    * `partOfId` — present when `partCol` is a pure function of the id
    * (the id-hash bucket tables) — maps an id to its partition value
    * DRIVER-SIDE, replacing the doomed-partition probe job with a map
    * over the already-collected tombstone ids. It MUST agree with the
    * writer's hash (use [[idHashPartition]]); when absent the probe
    * scan runs as before. */
  final case class Stamped(
      table: String,
      partCol: String,
      schema: StructType,
      idCol: String,
      partOfId: Option[Long => String] = None)

  /** The driver-side twin of the writers' partition expression
    * `pmod(xxhash64(id), lit(buckets)).cast("int")` — same XXH64 seed
    * (42), same sign-safe modulus (spec-pinned against the Column form
    * over a wide id range). */
  def idHashPartition(buckets: Int): Long => String = { id =>
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(id, org.apache.spark.sql.types.LongType, 42L)
    val b = buckets.toLong
    (((h % b) + b) % b).toInt.toString
  }

  /** Parse the id-hash modulus out of a family layout stamp
    * (`... stateBuckets=N ...`) — how the dedup/vector compaction
    * helpers recover the modulus their rows were written under without
    * widening their signatures. None (→ probe fallback) when the stamp
    * is absent or unparseable. */
  def stampBuckets(stamp: Option[String]): Option[Int] =
    stamp.flatMap("""stateBuckets=(\d+)""".r.findFirstMatchIn(_))
      .map(_.group(1).toInt)

  def compact(
      cat: Catalog,
      log: OpLog,
      tombTable: String,
      tombSchema: StructType,
      tombIdCol: String,
      tables: Seq[Stamped],
      maxFilesPerPartition: Int = 2,
      checkpointLog: Boolean = false): Unit =
    // one lease per index family (scoped by its op log) covers the
    // whole multi-table window — the documented single-writer
    // maintenance discipline, enforced instead of assumed
    cat.withMaintenanceLease(log.table) {
    tables.foreach(t => cat.recoverCompaction(t.table, t.partCol))
    cat.recoverReplace(tombTable)
    // first-op safety: compaction may be the FIRST operation ever run on
    // this family (e.g. scheduled maintenance firing before any delete has
    // created the tombstone table) — reading a never-created table would
    // throw PATH_NOT_FOUND, so materialize the empty tables up front
    cat.ensureTable(tombTable, tombSchema)
    tables.foreach(t =>
      cat.ensurePartitionedTable(t.table, t.schema, Seq(t.partCol)))
    log.ensure()
    // one |ops|-row collect answers garbage seqs AND tombstone
    // visibility (single-writer lease; see OpLog.Snapshot)
    val snap = log.snapshot()
    val garbage = snap.garbageSeqs
    // ONE collect of the tombstone table (bounded by deletes since the
    // last compaction) replaces the old localCheckpoint + isEmpty jobs
    // AND feeds the driver-side forced-partition derivation below. The
    // committed subset is the applied snapshot; its local-relation form
    // broadcasts into every rewrite's live-filter with zero re-scans.
    val tombSeqIdx = tombSchema.fieldIndex("seq")
    val tombIdIdx = tombSchema.fieldIndex(tombIdCol)
    val committedRows = cat.readWithSchema(tombTable, tombSchema).collect()
      .filter(r => snap.seqVisible(r.getLong(tombSeqIdx)))
    val haveTombs = committedRows.nonEmpty
    val committedTombs = cat.spark.createDataFrame(
      java.util.Arrays.asList(committedRows: _*), tombSchema)
    // per-table work: probe (only where partOfId can't answer) + the
    // staged partition rewrite. Independent across tables — run them
    // CONCURRENTLY (guide §2.6) under lease delegation so the swap
    // points' fencing still sees the family lease from worker threads.
    def compactOne(t: Stamped): Unit = {
      cat.spark.sparkContext
        .setJobDescription(s"compact ${t.table} [${log.table}]")
      val tombsAsId = committedTombs.withColumnRenamed(tombIdCol, t.idCol)
      def liveTransform(df: DataFrame): DataFrame = {
        val l =
          if (haveTombs) Tombstones.live(df, tombsAsId, t.idCol) else df
        if (garbage.isEmpty) l else l.filter(!F.col("seq").isin(garbage: _*))
      }
      // partitions holding affected rows. Id-hash tables derive them
      // driver-side from the collected tombstone ids (tombstones are
      // created from LIVE rows, so the id's partition holds its dead
      // generations; a redundant force merely rewrites a partition the
      // transform leaves row-identical). Garbage-seq rows can land in
      // any partition of the batch that crashed — when any exist, a
      // pushed-filter probe names their partitions; tables without an
      // id→partition map keep the full doomed-probe join.
      val forced: Seq[String] = t.partOfId match {
        case Some(f) =>
          val fromTombs: Seq[String] =
            if (!haveTombs) Nil
            else committedRows.map(r => f(r.getLong(tombIdIdx))).distinct.toSeq
          val fromGarbage: Seq[String] =
            if (garbage.isEmpty) Nil
            else cat.readWithSchema(t.table, t.schema)
              .filter(F.col("seq").isin(garbage: _*))
              .select(t.partCol).distinct().collect()
              .map(_.get(0).toString).toSeq
          (fromTombs ++ fromGarbage).distinct
        case None =>
          if (!haveTombs && garbage.isEmpty) Nil
          else {
            val df = cat.readWithSchema(t.table, t.schema)
            val ghost =
              if (!haveTombs) df.limit(0)
              else df
                .join(F.broadcast(Tombstones.lastSeq(tombsAsId, t.idCol)),
                  Seq(t.idCol))
                .filter(F.col("seq") < F.col("__tomb_seq")).drop("__tomb_seq")
            val doomed =
              if (garbage.isEmpty) ghost
              else ghost.unionByName(df.filter(F.col("seq").isin(garbage: _*)))
            doomed.select(t.partCol).distinct().collect()
              .map(_.get(0).toString).toSeq
          }
      }
      cat.compactPartitioned(t.table, t.partCol, t.schema,
        maxFilesPerPartition = maxFilesPerPartition,
        transform =
          if (haveTombs || garbage.nonEmpty) liveTransform _ else identity,
        forceValues = forced)
    }
    if (tables.size <= 1) tables.foreach(compactOne)
    else cat.runDelegated(tables.map(t => () => compactOne(t)))
    if (haveTombs || garbage.nonEmpty) {
      // anti-join the RAW table against the applied LOCAL snapshot (not
      // a driver-computed keep set): a tombstone appended between our
      // collect and this rewrite — impossible under the family lease,
      // but cheap to stay correct about under a TTL-overrun two-writer
      // window — survives un-applied instead of resurrecting its doc
      val keep = cat.readWithSchema(tombTable, tombSchema).join(
        committedTombs.select(tombIdCol, "seq"),
        Seq(tombIdCol, "seq"), "leftanti")
      cat.replaceTable(tombTable,
        if (garbage.isEmpty) keep
        else keep.filter(!F.col("seq").isin(garbage: _*)))
    }
    // last: fold the op log itself (two one-row files per op otherwise
    // accrete forever — the log is read several times per op, so its
    // FILE count is a per-batch cost). Abandoned-attempt rows are KEPT
    // (one row each, bounded by crash count): this pass only scrubbed
    // the Stamped tables, and a family may hold garbage-seq rows in
    // sidecar tables it owns privately (the vector index's model
    // table) — dropping the attempt row would flip those rows to
    // never-seen = committed-by-convention, resurrecting a crashed
    // rebuild. A crash inside the fold heals at the next log access.
    // The fold is computed from the snapshot already collected above
    // (nothing appended to the log since — this pass writes no ops), so
    // it costs one local-relation write instead of a log re-scan.
    // checkpointLog additionally folds the committed HISTORY into one
    // summed summary row ([[OpLog.checkpointFromSnapshot]]) — opt-in,
    // for long-lived tenants whose serve-side |ops|-row stats aggregate
    // has grown past noise; it trades per-op history for the loud
    // staleness guard on replays ([[OpLog.replayState]]).
    if (checkpointLog) log.checkpointFromSnapshot(snap)
    else log.compactFromSnapshot(snap)
  }
}
