package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Generational tombstones for append-only incremental indexes — the
  * delete/replace half of the reference's upsert semantics
  * (populate_postgres.sql:14-28 `ON CONFLICT` is replace; an append-only
  * index without deletes keeps scoring removed documents forever).
  *
  * Model: every index row carries the monotone operation sequence `seq`
  * that wrote it; a tombstone `(id, seq)` kills every generation of `id`
  * written at-or-before `seq`. A later re-ingest writes a NEW generation
  * with a larger seq, which survives — so delete-then-reinsert needs no
  * index rewrite at all. Physical application happens at compaction
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
    * is strictly NEWER than its id's last tombstone (or the id was never
    * tombstoned). Under the insert-if-absent ingest discipline at most
    * one generation per id is live.
    */
  def live(
      rows: DataFrame,
      tomb: DataFrame,
      idCol: String = "doc_id",
      seqCol: String = "seq"): DataFrame =
    rows.join(F.broadcast(lastSeq(tomb, idCol)), Seq(idCol), "left")
      .filter(F.col("__tomb_seq").isNull || F.col(seqCol) > F.col("__tomb_seq"))
      .drop("__tomb_seq")
}
