package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

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
}
