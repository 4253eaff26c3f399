package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Insert-if-absent dedup upsert (reference J3 + K1): the engine's one
  * write-path operator that needs real design.
  *
  * The reference expresses this as `INSERT ... ON CONFLICT (trip_key) DO
  * NOTHING` against a unique index (populate_postgres.sql:14-28,
  * create_objects.sql:22). Spark has no indexes, so uniqueness is an
  * *invariant of this operator*: after every batch,
  * `count(distinct key) == count(*)` on the historical table.
  *
  * Decomposition (SURVEY.md §2.4):
  *   1. collapse duplicates inside the incoming batch (the unique index
  *      also collapses intra-batch dupes in the reference) — dropDuplicates
  *      on the key = partial-agg-friendly hash aggregate;
  *   2. left-anti join against existing keys — only the KEY column of hist
  *      is scanned (column pruning reaches the parquet footer), so the
  *      anti-join shuffles 32-byte keys, not rows;
  *   3. append the survivors.
  *
  * Scale notes (100 TB hist):
  *  - the anti-join build side is `hist.select(key)` — with a sha2 key
  *    that is ~3% of table bytes; AQE picks broadcast when a partition-
  *    pruned key set fits, shuffle-hash otherwise;
  *  - with a date-partitioned hist table, callers should pre-filter hist
  *    to the partitions a batch can collide with (batches are usually
  *    time-bounded), turning the full-table key scan into a pruned one;
  *  - the operator never collects to the driver and has exactly one
  *    shuffle (the join), since dropDuplicates re-uses the same hash
  *    partitioning on the key.
  */
object Upsert {

  /** Rows of `batch` whose `key` is absent from `existing`, deduped within
    * the batch. Pure transformation — callers append the result.
    */
  def newRows(batch: DataFrame, existing: DataFrame, key: String): DataFrame =
    batch
      .dropDuplicates(key)
      .join(existing.select(key), Seq(key), "left_anti")

  /** Partition-pruned upsert for time-bounded batches: when batches are
    * known to only ever collide with a bounded window of history (trips
    * arrive within hours, events within days), scanning ALL historical
    * keys is wasted I/O at 100 TB. This variant computes the batch's
    * [min, max] of `boundCol` and prunes the historical side to that
    * range (+/- nothing — collisions require equal keys, and equal keys
    * imply equal bound values since the bound participates in the key),
    * so with a date-partitioned hist table the anti-join reads only the
    * overlapping partitions.
    */
  def newRowsPruned(
      batch: DataFrame,
      existing: DataFrame,
      key: String,
      boundCol: String): DataFrame = {
    val r = batch.agg(
      F.min(F.col(boundCol)).as("lo"), F.max(F.col(boundCol)).as("hi")).head()
    if (r.isNullAt(0)) batch.dropDuplicates(key).limit(0)
    else {
      val pruned = existing
        .filter(F.col(boundCol) >= r.get(0) && F.col(boundCol) <= r.get(1))
      newRows(batch, pruned, key)
    }
  }

  /** The dedup invariant the unique index guaranteed in the reference. */
  def holdsUniqueness(df: DataFrame, key: String): Boolean = {
    val row = df.agg(
      F.count(F.lit(1)).as("n"),
      F.count_distinct(F.col(key)).as("d")).head()
    row.getLong(0) == row.getLong(1)
  }
}
