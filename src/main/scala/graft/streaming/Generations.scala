package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
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
  * Partition-local by construction: each table is probed (bounded by
  * its partition count) for partitions holding doomed rows, and
  * [[graft.sources.Catalog.compactPartitioned]] rewrites those plus any
  * partition over the small-file threshold — untouched partitions'
  * files are byte-identical afterwards (spec-pinned). At 100 TB a
  * maintenance pass that dropped 0.1% dead rows by rewriting the whole
  * corpus table would be the wrong plan; this one's cost tracks the
  * affected partitions.
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
  */
object Generations {

  /** One table of a stamped family: hive-partitioned on `partCol`, id
    * column `idCol` (what tombstones kill by), generation column `seq`. */
  final case class Stamped(
      table: String,
      partCol: String,
      schema: StructType,
      idCol: String)

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
    val rawTombs = cat.readWithSchema(tombTable, tombSchema)
    val committedTombs = snap.visible(rawTombs)
      .localCheckpoint() // small; referenced by probe + transform + clear
    val haveTombs = !committedTombs.isEmpty
    tables.foreach { t =>
      val tombsAsId = committedTombs.withColumnRenamed(tombIdCol, t.idCol)
      def doomed(df: DataFrame): DataFrame = {
        val ghost =
          if (!haveTombs) df.limit(0)
          else df
            .join(F.broadcast(Tombstones.lastSeq(tombsAsId, t.idCol)),
              Seq(t.idCol))
            .filter(F.col("seq") < F.col("__tomb_seq")).drop("__tomb_seq")
        if (garbage.isEmpty) ghost
        else ghost.unionByName(df.filter(F.col("seq").isin(garbage: _*)))
      }
      def liveTransform(df: DataFrame): DataFrame = {
        val l =
          if (haveTombs) Tombstones.live(df, tombsAsId, t.idCol) else df
        if (garbage.isEmpty) l else l.filter(!F.col("seq").isin(garbage: _*))
      }
      // partitions holding affected rows: a bounded probe
      val forced =
        if (!haveTombs && garbage.isEmpty) Nil
        else doomed(cat.readWithSchema(t.table, t.schema))
          .select(t.partCol).distinct().collect().map(_.get(0).toString).toSeq
      cat.compactPartitioned(t.table, t.partCol, t.schema,
        maxFilesPerPartition = maxFilesPerPartition,
        transform =
          if (haveTombs || garbage.nonEmpty) liveTransform _ else identity,
        forceValues = forced)
    }
    if (haveTombs || garbage.nonEmpty) {
      val keep = rawTombs.join(
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
    // checkpointLog additionally folds the committed HISTORY into one
    // summed summary row ([[OpLog.checkpoint]]) — opt-in, for
    // long-lived tenants whose serve-side |ops|-row stats aggregate
    // has grown past noise; it trades per-op history for the loud
    // staleness guard on replays ([[OpLog.replayState]]).
    if (checkpointLog) log.checkpoint() else log.compact()
  }
}
