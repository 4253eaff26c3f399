package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Trip
import graft.operators.{TripQueries, Upsert}
import graft.sources.{Catalog, TripCsvSource}

/** The batch pipeline DAG (reference O1, `make all` -> Makefile:13):
  * ensure tables -> ingest CSV to staging -> derive trip_key -> dedup
  * upsert into hist -> truncate staging -> refresh the summarized view.
  * Designed to be idempotent per batch, exactly like the reference's
  * cron-style re-runnable flow (README.md:27).
  *
  * Status reporting (reference O2 — "watch the Spark UI, no polling"):
  * Spark's UI/REST and `sparkContext.statusTracker` give this for free;
  * [[status]] exposes the programmatic form.
  */
final class Pipeline(spark: SparkSession, warehouse: String) {

  val catalog = new Catalog(spark, warehouse)

  val StagingTable = "stg_trip_data"
  val HistTable = "hist_trip_data"
  val ViewTable = "summarized_trip_data"

  /** CREATE TABLE IF NOT EXISTS for the staging + historical layer
    * (create_objects.sql:2-19).
    */
  def ensureTables(): Unit = {
    catalog.ensureTable(StagingTable, Trip.schemaWithDate)
    catalog.ensurePartitionedTable(HistTable, Trip.schemaWithDate, Seq("trip_date"))
  }

  /** One batch end-to-end (populate_postgres.sql:2-34).
    *
    * The historical table is laid out partitioned by `trip_date`
    * (derived from date_time), and the upsert prunes the historical
    * side to the batch's date window: trips arrive time-bounded, so at
    * 100 TB the anti-join reads a handful of partitions instead of the
    * full key history. trip_date is derived from a keyed column, so
    * equal keys always imply equal dates and pruning cannot miss a
    * collision.
    */
  def runBatch(csvPath: String): Unit = {
    ensureTables()
    // COPY ... FROM csv (S2): land the file positionally, all strings.
    val raw = TripCsvSource.read(spark, csvPath)
    // UPDATE ... SET trip_key = CONCAT(...) (P3).
    val keyed = raw
      .withColumn("trip_key", Trip.tripKey)
      .withColumn("trip_date",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("date_time")))
    catalog.overwrite(StagingTable, keyed) // staging holds exactly this batch
    // INSERT ... ON CONFLICT DO NOTHING (J3): dedup upsert into hist,
    // pruned to the batch's date range.
    val stg = catalog.read(StagingTable)
    val hist = this.hist
    catalog.appendPartitioned(HistTable,
      Upsert.newRowsPruned(stg, hist, "trip_key", "trip_date"),
      Seq("trip_date"))
    // TRUNCATE staging (S5).
    catalog.truncate(StagingTable)
    // REFRESH MATERIALIZED VIEW (S6) — incrementally: only the week
    // buckets this batch touched are recomputed and replaced.
    refreshSummarizedViewIncremental(keyed)
  }

  /** Materialized-view full refresh: recompute + overwrite, stored
    * partitioned by week bucket so incremental refreshes can replace
    * individual buckets (SURVEY.md §1.4).
    */
  def refreshSummarizedView(): Unit =
    catalog.overwritePartitioned(ViewTable,
      TripQueries.weeklyAvgTripsPerRegion(hist), Seq("week_of_month"))

  /** Incremental materialized-view refresh: recompute ONLY the week
    * buckets the batch's trip dates fall into — the historical scan is
    * pruned to those weeks' date ranges (partition pruning on
    * trip_date), and Spark's dynamic partition overwrite replaces just
    * the recomputed buckets on disk. A full refresh scans ALL history
    * every batch; at 100 TB with time-bounded batch arrivals this scans
    * a handful of week partitions instead. Falls back to the full
    * refresh when the view does not exist yet.
    */
  def refreshSummarizedViewIncremental(batch: DataFrame): Unit = {
    import org.apache.spark.sql.{functions => F}
    // full rewrite when the view is absent OR still in a legacy FLAT
    // layout (no week_of_month= dirs): a dynamic-partition overwrite on
    // top of flat parquet files would mix the two layouts at the table
    // root and break subsequent reads
    if (!catalog.exists(ViewTable) ||
        !catalog.hasPartitionDirs(ViewTable, "week_of_month")) {
      refreshSummarizedView(); return
    }
    // a batch's distinct trip dates are bounded (time-bounded arrival),
    // so collecting them to plan the prune is a scalar-sized action
    val dates = batch
      .select(F.to_date(F.col("date_time")).as("d")).distinct()
      .collect().map(_.getDate(0).toLocalDate)
    if (dates.isEmpty) return
    // affected week-of-month windows: [monthStart + 7*(w-1), +7) capped
    // at month end — the same blocks the view buckets by
    val windows = dates.map { d =>
      val start = d.withDayOfMonth(1).plusDays(((d.getDayOfMonth - 1) / 7) * 7L)
      val end0 = start.plusDays(6)
      val monthEnd = d.withDayOfMonth(d.lengthOfMonth)
      (start, if (end0.isAfter(monthEnd)) monthEnd else end0)
    }.distinct
    val prune = windows.map { case (s, e) =>
      F.col("trip_date").between(
        F.lit(java.sql.Date.valueOf(s)), F.lit(java.sql.Date.valueOf(e)))
    }.reduce(_ || _)
    val recomputed = TripQueries.weeklyAvgTripsPerRegion(hist.filter(prune))
    catalog.overwritePartitioned(ViewTable, recomputed,
      Seq("week_of_month"), dynamic = true)
  }

  /** Declared view schema — read schema-first: bucket strings like
    * "2024-01-03" would otherwise be type-INFERRED into dates by
    * partition discovery.
    */
  private val viewSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("region", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("weekly_avg", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("week_of_month", org.apache.spark.sql.types.StringType)))

  /** Compact accreted small files in the historical table (each batch's
    * pruned anti-join append adds files to the dates it touches). Run
    * periodically, like the reference's cron cadence (README.md:27).
    */
  def compactHist(maxFilesPerPartition: Int = 8,
      targetFileBytes: Long = 128L * 1024 * 1024): Seq[String] =
    catalog.compactPartitioned(HistTable, "trip_date", Trip.schemaWithDate,
      maxFilesPerPartition, targetFileBytes)

  def hist: DataFrame = catalog.readWithSchema(HistTable, Trip.schemaWithDate)
  def summarized: DataFrame =
    catalog.readWithSchema(ViewTable, viewSchema)
      .select("region", "week_of_month", "weekly_avg")

  /** Programmatic ingestion status (O2): live job/stage counts. */
  def status(): String = {
    val t = spark.sparkContext.statusTracker
    val active = t.getActiveJobIds().length
    val stages = t.getActiveStageIds().length
    s"activeJobs=$active activeStages=$stages"
  }
}

/** Ad-hoc SQL execution channel (reference O3): SQL text in, DataFrame
  * out, with the engine's custom functions registered.
  */
object SqlRunner {
  def run(spark: SparkSession, sqlText: String): DataFrame = {
    GraftFunctions.register(spark)
    spark.sql(sqlText)
  }
}
