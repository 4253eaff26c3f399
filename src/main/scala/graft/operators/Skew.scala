package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Skew-mitigation operators. AQE's skew-join splitting handles join-side
  * skew at runtime; these handle AGGREGATION skew (a handful of keys
  * carrying most rows — the classic hot-user / hot-document problem),
  * which AQE does not rewrite.
  */
object Skew {

  /** Two-phase salted aggregation for additive aggregates: rows are
    * spread across `salts` sub-keys, partially aggregated per
    * (key, salt), then re-aggregated per key. The first shuffle fans the
    * hot key across `salts` reducers instead of one; the second shuffle
    * carries only `salts` rows per key.
    *
    * Only valid for aggregates that compose associatively from partials
    * (sum/count/min/max — pass the partial-merge expressions in
    * `finalAggs` accordingly).
    */
  def saltedAggregate(
      df: DataFrame,
      key: Seq[String],
      salts: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salts.toLong)))
    val partial = salted
      .groupBy((key.map(F.col) :+ F.col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(key.map(F.col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
      .drop("__salt")
  }

  /** Salted count per key — the common case packaged. */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    saltedAggregate(
      df, Seq(key), salts,
      partialAggs = Seq(F.count(F.lit(1)).as("c")),
      finalAggs = Seq(F.sum("c").as("n")))

  /** Broadcast-salt join for a skewed LEFT side against a small-ish right
    * side: the right side is replicated `salts` times so the hot left
    * keys spread over `salts` reducers. Use when the right side is too
    * big to broadcast outright but small enough to replicate.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salts.toLong)))
    val saltsDf = right.sparkSession.range(salts).select(F.col("id").as("__salt"))
    val replicatedRight = right.crossJoin(F.broadcast(saltsDf))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew diagnostic panel — the measurement that decides whether a
    * join/aggregation needs [[saltedAgg]]/[[saltedJoin]] at all: per
    * group, the key count, row count, hottest key's rows, the top-k
    * keys' combined rows, and their exact milli share of the group.
    * Read it per snapshot; a topk_share_milli drifting toward 1000
    * means the hot keys are about to own a reducer.
    *
    * Scale shape: the per-key counts partial-aggregate BEFORE anything
    * else, so the rank window runs over the |groups|×|keys| count
    * table, never the raw rows; ties break on key id so the top-k cut
    * is deterministic.
    */
  def keySkewPanel(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      topK: Int = 10): DataFrame = {
    val c = df.groupBy(F.col(groupCol).as("grp"), F.col(keyCol).as("key"))
      .agg(F.count(F.lit(1)).as("n"))
    val w = Window.partitionBy("grp").orderBy(F.col("n").desc, F.col("key").asc)
    val tot = c.groupBy("grp")
      .agg(F.count(F.lit(1)).as("n_keys"), F.sum("n").as("n_rows"))
    val top = c.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= topK)
      .groupBy("grp")
      .agg(F.max("n").as("max_key_rows"), F.sum("n").as("topk_rows"))
    tot.join(top, Seq("grp"))
      .select(F.col("grp"), F.col("n_keys"), F.col("n_rows"),
        F.col("max_key_rows"), F.col("topk_rows"),
        F.expr("topk_rows * 1000 div n_rows").as("topk_share_milli"))
  }
}
