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
      rightIdCol: String): DataFrame =
    asofImpl(left, right, keyCols, tsCol, leftIdCol, rightIdCol, forward = false)

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
      rightIdCol: String): DataFrame =
    asofImpl(left, right, keyCols, tsCol, leftIdCol, rightIdCol, forward = true)

  /** Shared union + running-last machinery. The two directions differ
    * only in sort orientation: backward walks ts ascending (running
    * last = latest prior right, ties to HIGHEST rid), forward walks ts
    * descending (running last = earliest following right, ties to
    * LOWEST rid via rid desc). In both, right rows (side 0) sort before
    * left rows (side 1) at equal ts so a same-instant right row is
    * visible to the left row's running last.
    */
  /** Nearest-either-direction as-of: for every left row, the right row
    * minimizing |right.ts − left.ts| on the same key — backward and
    * forward composed, ties (equal gaps) resolved to the PRIOR row.
    * Returns key cols + left id + matched right id + `direction`
    * ('prior'/'next', null when no right row exists on the key) +
    * `gap_us` (exact micros).
    *
    * REQUIRES unique LEFT ids (true of any id column): the backward and
    * forward passes meet in an equi-join on the left id, so duplicated
    * left ids would cross-multiply their prior/next matches into rows
    * neither input justifies. Right ids carry no such constraint.
    *
    * Scale shape: two one-shuffle as-of passes (the shared union +
    * running-last core) joined once on the left id. The matched row's
    * ts rides the SAME running-last window frame as its id (both are
    * non-null exactly on right rows, so `last(..., ignoreNulls)` picks
    * them from the same row) — no re-join against the right table, so
    * duplicate right ids cannot fan out left rows and the right id's
    * type never crosses a coercion boundary. Still no pair explosion,
    * no range join.
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      leftIdCol: String,
      rightIdCol: String): DataFrame = {
    val keys = keyCols.map(F.col)
    val back = asofImpl(left, right, keyCols, tsCol, leftIdCol, rightIdCol,
        forward = false, withMatchedTs = true)
      .select(keys ++ Seq(F.col(leftIdCol),
        F.unix_micros(F.col(tsCol)).as("__lts"),
        F.col(s"matched_$rightIdCol").as("__prior"),
        F.col("__matched_ts_us").as("__pts")): _*)
    val fwd = asofImpl(left, right, keyCols, tsCol, leftIdCol, rightIdCol,
        forward = true, withMatchedTs = true)
      .select(F.col(leftIdCol), F.col(s"matched_$rightIdCol").as("__next"),
        F.col("__matched_ts_us").as("__nts"))
    val j = back.join(fwd, Seq(leftIdCol))
    val gapPrior = F.col("__lts") - F.col("__pts")
    val gapNext = F.col("__nts") - F.col("__lts")
    val useNext = F.col("__prior").isNull ||
      (F.col("__next").isNotNull && gapNext < gapPrior)
    j.select(keys ++ Seq(
      F.col(leftIdCol),
      F.when(useNext, F.col("__next")).otherwise(F.col("__prior"))
        .as(s"matched_$rightIdCol"),
      F.when(F.col("__prior").isNull && F.col("__next").isNull,
          F.lit(null).cast("string"))
        .when(useNext, F.lit("next")).otherwise(F.lit("prior"))
        .as("direction"),
      F.when(useNext, gapNext).otherwise(gapPrior).as("gap_us")): _*)
  }

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      leftIdCol: String,
      rightIdCol: String,
      forward: Boolean,
      withMatchedTs: Boolean = false): DataFrame = {
    val keys = keyCols.map(F.col)
    val l = left.select(keys ++ Seq(
      F.col(tsCol).as("__ts"), F.lit(1).as("__side"),
      F.col(leftIdCol).cast("long").as("__lid"),
      F.lit(null).cast("long").as("__rid"),
      F.lit(null).cast("long").as("__rts")): _*)
    val r = right.select(keys ++ Seq(
      F.col(tsCol).as("__ts"), F.lit(0).as("__side"),
      F.lit(null).cast("long").as("__lid"),
      F.col(rightIdCol).cast("long").as("__rid"),
      F.unix_micros(F.col(tsCol)).as("__rts")): _*)
    val (tsOrd, ridOrd) =
      if (forward) (F.col("__ts").desc, F.col("__rid").desc)
      else (F.col("__ts").asc, F.col("__rid").asc)
    val w = Window.partitionBy(keys: _*)
      .orderBy(tsOrd, F.col("__side").asc, ridOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__matched", F.last(F.col("__rid"), ignoreNulls = true).over(w))
      .withColumn("__matched_ts_us",
        F.last(F.col("__rts"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
    val base = keys ++ Seq(
      F.col("__lid").as(leftIdCol),
      F.col("__ts").as(tsCol),
      F.col("__matched").as(s"matched_$rightIdCol"))
    matched.select(
      (if (withMatchedTs) base :+ F.col("__matched_ts_us") else base): _*)
  }
}
