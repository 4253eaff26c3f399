package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Generational tombstones for append-only incremental indexes — the
  * delete/replace half of the reference's upsert semantics
  * (populate_postgres.sql:14-28 `ON CONFLICT` is replace; an append-only
  * index without deletes keeps scoring removed documents forever).
  *
  * Model: every index row carries the monotone operation sequence `seq`
  * that wrote it; a tombstone `(id, seq)` kills every generation of `id`
  * written strictly BEFORE `seq`. A later re-ingest writes a NEW
  * generation with a larger seq, which survives — so delete-then-
  * reinsert needs no index rewrite at all — and a generation written AT
  * the tombstone's own seq survives too, which is what lets a single
  * exactly-once op REPLACE a document (tombstone the old generations
  * and write the new one under one seq, one attempt marker, one commit:
  * [[graft.streaming.Bm25Index.replace]]). Physical application happens at compaction
  * (rewrite the affected partitions dropping dead rows, then clear the
  * applied tombstones); until then [[live]] filters logically at serve.
  * Applying a tombstone twice is a no-op (the dead rows are already
  * gone), so serving concurrently with compaction never double-drops.
  *
  * Scale shape: the tombstone set is bounded by deletes since the last
  * compaction (which applies and clears them), so [[live]] broadcasts
  * it; the per-id reduce in [[lastSeq]] is tombstone-sized.
  */
object Tombstones {

  /** Last tombstone sequence per id — tombstone-table-sized. */
  def lastSeq(tomb: DataFrame, idCol: String = "doc_id"): DataFrame =
    tomb.groupBy(F.col(idCol)).agg(F.max("seq").as("__tomb_seq"))

  /** Rows that survive the tombstones: a row is live iff its generation
    * is at-or-after its id's last tombstone (or the id was never
    * tombstoned) — deletes always stamp a seq above every existing
    * generation (monotone ops), and the at-seq survival is the replace
    * arm. Under the insert-if-absent ingest discipline at most one
    * generation per id is live.
    *
    * The tombstone side broadcasts only while its planner size estimate
    * fits `maxBroadcastBytes` — the "deletes since last compaction stay
    * broadcast-sized" assumption is a convention, and a delete-heavy
    * tenant that never compacts would otherwise eventually blow the
    * broadcast (driver OOM). Past the threshold the join degrades to a
    * shuffle join — slower, never wrong. The estimate comes from
    * `optimizedPlan.stats` (file sizes for parquet-backed tombstones,
    * carried-over stats for checkpointed ones): a metadata lookup, not
    * a job, so the guard costs nothing per call; an UNKNOWN estimate
    * (defaultSizeInBytes) conservatively falls back to the shuffle.
    */
  def live(
      rows: DataFrame,
      tomb: DataFrame,
      idCol: String = "doc_id",
      seqCol: String = "seq",
      maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    val last = lastSeq(tomb, idCol)
    val build =
      if (last.queryExecution.optimizedPlan.stats.sizeInBytes
          <= BigInt(maxBroadcastBytes)) F.broadcast(last)
      else last
    rows.join(build, Seq(idCol), "left")
      .filter(F.col("__tomb_seq").isNull || F.col(seqCol) >= F.col("__tomb_seq"))
      .drop("__tomb_seq")
  }
}
