package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** BATCH sessionization — the backfill/reprocessing counterpart of the
  * streaming `Streams.sessionize`: gap-based sessions computed over an
  * at-rest event table with the classic two-window formulation
  * (break-flag via lag, session index via running sum). Real pipelines
  * need both: streaming for the live path, batch for backfills and for
  * recomputing sessions after a rule change.
  *
  * Scale shape: ONE shuffle — both windows share the (user, time)
  * partitioning+ordering, so Catalyst plans a single Exchange + Sort
  * and evaluates the lag and the running sum in the same window stage;
  * the per-session aggregate then reuses the same hash partitioning.
  */
object Sessions {

  /** Per-session summary: (userCol, session_idx, n_events, start_us,
    * end_us, duration_us) with epoch-microsecond integer bounds.
    * `orderTieCol` breaks equal-timestamp ties deterministically.
    */
  def sessionizeBatch(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      orderTieCol: String = "event_id",
      gapMinutes: Int = 30): DataFrame = {
    require(!events.columns.contains("session_idx") && !events.columns.contains("__us"),
      "input already carries session_idx/__us — drop or rename before re-sessionizing")
    val w = Window.partitionBy(userCol)
      .orderBy(F.col(tsCol).asc, F.col(orderTieCol).asc)
    val gapUs = gapMinutes * 60L * 1000000L
    val us = F.unix_micros(F.col(tsCol))
    val prev = F.lag(us, 1).over(w)
    val brk = F.when(prev.isNull || us - prev > gapUs, 1L).otherwise(0L)
    events
      .withColumn("__us", us)
      .withColumn("session_idx", F.sum(brk).over(w))
      .groupBy(F.col(userCol), F.col("session_idx"))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        F.min(F.col("__us")).as("start_us"),
        F.max(F.col("__us")).as("end_us"))
      .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
  }
}
