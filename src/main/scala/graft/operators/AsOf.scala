package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of (nearest-prior) join: for every left row, the single latest
  * right row with `right.ts <= left.ts` on the same key — the standard
  * time-series alignment operator (trade-to-quote, event-to-state).
  *
  * Spark has no native ASOF JOIN, and the naive formulations are a
  * range self-join (per-key quadratic blowup) or a per-row correlated
  * lookup (driver round-trips). This implementation uses the
  * union + running-last window: tag both sides, union them, and take
  * `last(right_id, ignoreNulls)` over
  * (key ORDER BY ts, side, right_id ROWS UNBOUNDED PRECEDING).
  * ONE shuffle on the key, linear work per row — the scale-safe as-of
  * shape; at 100 TB the window sort rides the same exchange a range
  * join would need anyway, with no pair explosion.
  *
  * Tie semantics (pinned, deterministic): a right row at exactly
  * left.ts DOES match (<=); among right rows sharing that latest ts the
  * HIGHEST right id wins.
  */
object AsOf {

  /** @return left key columns + left id + `matched_<rightIdCol>`
    *         (null when no right row precedes the left row).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      leftIdCol: String,
      rightIdCol: String): DataFrame = {
    val keys = keyCols.map(F.col)
    val l = left.select(keys ++ Seq(
      F.col(tsCol).as("__ts"), F.lit(1).as("__side"),
      F.col(leftIdCol).cast("long").as("__lid"),
      F.lit(null).cast("long").as("__rid")): _*)
    val r = right.select(keys ++ Seq(
      F.col(tsCol).as("__ts"), F.lit(0).as("__side"),
      F.lit(null).cast("long").as("__lid"),
      F.col(rightIdCol).cast("long").as("__rid")): _*)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    // same-instant right row is visible to the left row's running last
    val w = Window.partitionBy(keys: _*)
      .orderBy(F.col("__ts").asc, F.col("__side").asc, F.col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__matched", F.last(F.col("__rid"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
      .select(keys ++ Seq(
        F.col("__lid").as(leftIdCol),
        F.col("__ts").as(tsCol),
        F.col("__matched").as(s"matched_$rightIdCol")): _*)
  }

  /** Forward as-of: for every left row, the single EARLIEST right row
    * with `right.ts >= left.ts` on the same key — the look-AHEAD
    * alignment (event-to-next-state, order-to-next-shipment). Same
    * union + running-last shape as [[asofJoin]], walking time backwards:
    * ONE shuffle, no pair explosion.
    *
    * Tie semantics (pinned): a right row at exactly left.ts DOES match;
    * among right rows sharing that earliest ts the LOWEST right id wins.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      leftIdCol: String,
      rightIdCol: String): DataFrame = {
    val keys = keyCols.map(F.col)
    val l = left.select(keys ++ Seq(
      F.col(tsCol).as("__ts"), F.lit(1).as("__side"),
      F.col(leftIdCol).cast("long").as("__lid"),
      F.lit(null).cast("long").as("__rid")): _*)
    val r = right.select(keys ++ Seq(
      F.col(tsCol).as("__ts"), F.lit(0).as("__side"),
      F.lit(null).cast("long").as("__lid"),
      F.col(rightIdCol).cast("long").as("__rid")): _*)
    // ts DESCENDING: the running last right id is the nearest right at
    // or after the left row; right rows still sort before left rows at
    // equal ts (side 0 < 1), and __rid DESC makes the running last the
    // LOWEST id among same-instant right rows
    val w = Window.partitionBy(keys: _*)
      .orderBy(F.col("__ts").desc, F.col("__side").asc, F.col("__rid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__matched", F.last(F.col("__rid"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
      .select(keys ++ Seq(
        F.col("__lid").as(leftIdCol),
        F.col("__ts").as(tsCol),
        F.col("__matched").as(s"matched_$rightIdCol")): _*)
  }
}
