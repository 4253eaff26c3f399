package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types.{DateType, TimestampType}
import graft.functions.WeekOfMonth

/** The reference's entire analytics surface (SURVEY.md §2.10), expressed
  * as lazy DataFrame transformations over the historical trip table.
  * Each is a `DataFrame => DataFrame` so the same operators run on the
  * trip domain and on any table with analogous columns.
  */
object TripQueries {

  /** Canonical query 1 — `summarized_trip_data` (create_objects.sql:25-35):
    * weekly average trips per region, bucketed `YYYY-MM-0W` with Postgres
    * to_char 'W' week-of-month semantics.
    *
    * Faithful to the reference, the outer avg groups by the SAME key as
    * the inner count, so it averages a single value per group; the shape
    * (two-level aggregate) is preserved because it is the reference's
    * semantics, and Catalyst collapses what it can.
    */
  def weeklyAvgTripsPerRegion(hist: DataFrame): DataFrame = {
    val bucket = weekBucket(F.col("date_time").cast(DateType))
    val inner = hist
      .groupBy(F.col("region"), bucket.as("week_of_month"))
      .agg(F.count(F.lit(1)).as("count"))
    inner
      .groupBy("region", "week_of_month")
      .agg(F.ceil(F.avg("count")).as("weekly_avg"))
  }

  /** The `YYYY-MM-0W` bucket id (create_objects.sql:30-31): year-month,
    * a literal "-0", and week-of-month 1..5 — the zero-pad is safe because
    * W never exceeds one digit (SURVEY.md §7.4).
    */
  def weekBucket(date: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.concat(
      F.date_format(date, "yyyy-MM"),
      F.lit("-0"),
      WeekOfMonth.weekOfMonthArith(date).cast("string"))

  /** Canonical query 2 — regions having a given datasource
    * (cheap_mobile_datasource_regions.sql:1-4). The reference uses
    * GROUP BY with no aggregates; distinct produces the identical
    * HashAggregate physical plan (SURVEY.md §2.3 A5).
    */
  def regionsWithDatasource(hist: DataFrame, datasource: String = "cheap_mobile"): DataFrame =
    hist.filter(F.col("datasource") === datasource)
      .select("region")
      .distinct()

  /** Canonical query 3 — latest datasource among the two most-recurring
    * regions (latest_datasource.sql:1-23). Three-stage CTE chain:
    * count per region -> top-2 -> global max timestamp over the join ->
    * datasource(s) carrying that timestamp (argmax-by-join idiom).
    *
    * Plan shape at scale: the top-2 is TakeOrderedAndProject (no full
    * sort); the 2-row and 1-row intermediates broadcast, so the only
    * shuffle over the big table is the region count aggregate.
    */
  def latestDatasourceOfTopRegions(hist: DataFrame, k: Int = 2): DataFrame = {
    val regions = hist.groupBy("region").agg(F.count(F.lit(1)).as("appearance"))
    val recurring = regions.orderBy(F.col("appearance").desc).limit(k).select("region")
    val ts = F.col("date_time").cast(TimestampType)
    val latest = hist.join(F.broadcast(recurring), Seq("region"), "inner")
      .agg(F.max(ts).as("last_occurence"))
    hist.join(
        F.broadcast(latest),
        ts === F.col("last_occurence"),
        "inner")
      .select("datasource")
  }
}
