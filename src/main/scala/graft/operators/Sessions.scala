package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
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

  /** Per-key INTERVAL UNION: each event opens a fixed window
    * [ts, ts + windowUs); overlapping or touching windows merge, and
    * the output is each key's merged-interval count plus total covered
    * microseconds — the "actual active time" measure that per-event
    * sums overcount (the interval-algebra complement of
    * [[sessionizeBatch]], which groups by GAPS instead of merging by
    * OVERLAP). Touching intervals (next start == previous end) merge;
    * exact integer micros end to end.
    *
    * Scale shape: one shuffle — the break-flag running max and the
    * running group-id sum ride the SAME (key, start, tie) window sort
    * (window reuse, the SCD2 pattern), and the merge is a bounded
    * two-level aggregation on top.
    */
  def mergeIntervals(
      events: DataFrame,
      windowUs: Long = 300000000L,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val start = F.unix_micros(F.col(tsCol))
    val iv = events.select(F.col(keyCol), start.as("__s"),
      (start + F.lit(windowUs)).as("__e"), F.col(tieCol).as("__tie"))
    val wPrev = Window.partitionBy(keyCol).orderBy(F.col("__s"), F.col("__tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCol).orderBy(F.col("__s"), F.col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val brk = F.when(
      F.col("__s") > F.coalesce(F.max(F.col("__e")).over(wPrev),
        F.lit(Long.MinValue)), 1L).otherwise(0L)
    iv.withColumn("__g", F.sum(brk).over(wRun))
      .groupBy(F.col(keyCol), F.col("__g"))
      .agg(F.min("__s").as("__ms"), F.max("__e").as("__me"))
      .groupBy(F.col(keyCol))
      .agg(F.count(F.lit(1)).as("n_intervals"),
        F.sum(F.col("__me") - F.col("__ms")).as("covered_us"))
  }

  /** Per-key exponentially-weighted moving average over the event-time
    * order, in EXACT integers: smoothing factor num/2^shift (default
    * 1/2), recurrence `s' = (num·x + (2^shift − num)·s) >> shift` with
    * s seeded from the first value — arithmetic shift IS floor
    * division by 2^shift for any sign, so the fold replays exactly in
    * any engine with a list fold (the oracle uses `reduce`). The
    * recency-weighted per-user value signal (spend momentum, engagement
    * decay) that a plain mean hides.
    *
    * Scale shape: ONE shuffle keyed by `keyCol`, then a SECONDARY SORT
    * within partitions on (key, ts, tie) and a streaming per-partition
    * fold — per-key state is two longs (count, ewma) regardless of the
    * key's event count, so a bot key with 10^8 events costs time, not
    * task memory (the collect_list formulation this replaced held the
    * heaviest key's full (ts, id, value) array in one aggregation
    * buffer). The sort spills through Spark's external sorter, which is
    * exactly the machinery built for this. Same recurrence as the
    * streaming twin [[graft.streaming.Streams.streamingEwma]].
    *
    * Key-type contract: `keyCol` MUST be an integral column (it is
    * carried through the per-partition fold as a long). A string or
    * fractional key would null-cast or collapse groups silently, so the
    * requirement is enforced with a hard `require` up front instead.
    */
  def ewmaByKey(
      events: DataFrame,
      num: Long = 1L,
      shift: Int = 1,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      valCol: String = "value"): DataFrame = {
    val den = 1L << shift
    require(shift >= 1 && shift <= 32 && num >= 1 && num < den,
      "need 1 <= num < 2^shift")
    events.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"ewmaByKey requires an integral key column; $keyCol is $other " +
          "(string/fractional keys would null-cast or merge silently)")
    }
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .select(F.col(keyCol).cast("long").as("_1"),
        F.unix_micros(F.col(tsCol)).as("_2"),
        F.col(tieCol).cast("long").as("_3"),
        F.floor(F.col(valCol) * 100).cast("long").as("_4"))
      .as[(Long, Long, Long, Long)]
      .repartition(F.col("_1"))
      .sortWithinPartitions("_1", "_2", "_3")
    val folded = prepared.mapPartitions { it =>
      // rows arrive grouped by key and event-time-ordered within each
      // key; one buffered pass folds each key group with O(1) state
      val buf = it.buffered
      new Iterator[(Long, Long, Long)] {
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Long, Long) = {
          val k = buf.head._1
          var n = 0L
          var s = 0L
          while (buf.hasNext && buf.head._1 == k) {
            val x = buf.next()._4
            n += 1
            s = if (n == 1L) x else (num * x + (den - num) * s) >> shift
          }
          (k, n, s)
        }
      }
    }
    folded.toDF(keyCol, "n_events", "ewma_cents")
  }

  /** Rolling 7-day EXACT median of daily value totals per group — the
    * robust trend line a monitoring pipeline plots next to the raw
    * daily series (a one-day spike moves the mean, not the median).
    * Values quantize to cents (floor(value·100), floor on both engines
    * for either sign); the median is defined, replayably, as the
    * ⌈n/2⌉-th element of the sorted window — no interpolation, no
    * approx-percentile. `window` counts ROWS of the DAILY series (7 =
    * a week of present days).
    *
    * Scale shape: the raw events partial-aggregate to one row per
    * (group, day) BEFORE any window, so the sort/collect window runs
    * over the calendar-bounded daily table; collect_list holds at most
    * `window` longs per row. This is the window-over-aggregate
    * pattern — never sort raw events.
    */
  def rollingDailyMedian(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value",
      window: Int = 7): DataFrame = {
    require(window >= 1, "window >= 1")
    val day = F.expr(s"unix_micros($tsCol) div 86400000000")
    val cents = F.floor(F.col(valueCol).cast("double") * 100).cast("long")
    val daily = events
      .groupBy(F.col(groupCol).as("grp"), day.as("day"))
      .agg(F.sum(cents).as("cents"))
    val w = Window.partitionBy("grp").orderBy("day")
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("__win", F.sort_array(F.collect_list("cents").over(w)))
      .withColumn("__n", F.count(F.lit(1)).over(w))
      .select(F.col("grp"), F.col("day"), F.col("cents"),
        F.expr("element_at(__win, int((__n + 1) div 2))").as("med_cents"))
  }

  /** Conversion-latency cohort panel — signup-day cohorts graded on
    * time-to-first-purchase: signups, conversions within `withinUs`,
    * and the EXACT median and max first-conversion latency per cohort
    * (median = the ⌈n/2⌉-th converted row on the deterministic
    * (latency, user) order — a rank pick, not an interpolation). The
    * funnel-economics panel behind "is onboarding getting faster".
    *
    * Scale shape: both anchor events reduce to one row per user
    * BEFORE the latency join (argmin aggregations, not windows over
    * raw events); the rank window runs per cohort over the
    * user-bounded latency table. First-touch semantics: the earliest
    * `toType` at-or-after the user's earliest `fromType`.
    */
  def conversionLatency(
      events: DataFrame,
      fromType: String = "signup",
      toType: String = "purchase",
      withinUs: Long = 3L * 86400000000L,
      typeCol: String = "event_type",
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val us = F.expr(s"unix_micros($tsCol)")
    val su = events.filter(F.col(typeCol) === fromType)
      .groupBy(F.col(keyCol).as("user_id"))
      .agg(F.min(us).as("signup_us"))
    val pu = events.filter(F.col(typeCol) === toType)
      .select(F.col(keyCol).as("user_id"), us.as("ev_us"))
      .join(su, Seq("user_id"))
      .filter(F.col("ev_us") >= F.col("signup_us"))
      .groupBy("user_id")
      .agg(F.min("ev_us").as("purchase_us"))
    val lat = su.join(pu, Seq("user_id"), "left")
      .select(F.col("user_id"),
        F.expr("signup_us div 86400000000").as("cohort_day"),
        (F.col("purchase_us") - F.col("signup_us")).as("lat_us"))
    val wr = Window.partitionBy("cohort_day")
      .orderBy(F.col("lat_us").asc, F.col("user_id").asc)
    val wn = Window.partitionBy("cohort_day")
    val med = lat.filter(F.col("lat_us").isNotNull)
      .withColumn("rn", F.row_number().over(wr))
      .withColumn("nc", F.count(F.lit(1)).over(wn))
      .filter(F.expr("rn = (nc + 1) div 2"))
      .select(F.col("cohort_day"), F.col("lat_us").as("med_lat_us"))
    lat.groupBy("cohort_day")
      .agg(F.count(F.lit(1)).as("n_signups"),
        F.sum(F.when(F.col("lat_us") <= withinUs, 1L).otherwise(0L)).as("n_conv"),
        F.max("lat_us").as("max_lat_us"))
      .join(med, Seq("cohort_day"), "left")
      .select("cohort_day", "n_signups", "n_conv", "med_lat_us", "max_lat_us")
  }

  /** Per-key calendar-gap panel — the freshness/completeness check a
    * pipeline runs before trusting a daily feed: for each key's
    * activity days (distinct UTC epoch-days of its events), the
    * first/last day, days present, days missing inside the span, the
    * number of gap runs, and the longest gap — the gaps-and-islands
    * lag formulation on the DISTINCT-day table. Day arithmetic is
    * `unix_micros div 86400e6` (truncate == floor for the post-epoch
    * timestamps this panel is for), so every column replays exactly.
    *
    * Scale shape: the distinct collapses each key to at most
    * span-many day rows BEFORE the lag window, so the per-key window
    * partition is bounded by the calendar, not the event volume; one
    * (key, day) shuffle, one window, one |keys|-row aggregate.
    */
  def calendarGaps(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val day = F.expr(s"unix_micros($tsCol) div 86400000000")
    val d = events
      .select(F.col(keyCol).cast("long").as("key"), day.as("day"))
      .distinct()
    val w = Window.partitionBy("key").orderBy("day")
    val gap = F.col("prev").isNotNull && (F.col("day") - F.col("prev") > 1)
    d.withColumn("prev", F.lag("day", 1).over(w))
      .groupBy("key")
      .agg(
        F.min("day").as("first_day"),
        F.max("day").as("last_day"),
        F.count(F.lit(1)).as("n_days"),
        (F.max("day") - F.min("day") + 1 - F.count(F.lit(1))).as("n_missing"),
        F.sum(F.when(gap, 1L).otherwise(0L)).as("n_gaps"),
        F.coalesce(F.max(F.when(gap, F.col("day") - F.col("prev") - 1)),
          F.lit(0L)).as("longest_gap"))
  }
}
