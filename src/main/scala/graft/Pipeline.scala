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
    catalog.ensureTable(StagingTable, Trip.schema)
    catalog.ensureTable(HistTable, Trip.schema)
  }

  /** One batch end-to-end (populate_postgres.sql:2-34). */
  def runBatch(csvPath: String): Unit = {
    ensureTables()
    // COPY ... FROM csv (S2): land the file positionally, all strings.
    val raw = TripCsvSource.read(spark, csvPath)
    // UPDATE ... SET trip_key = CONCAT(...) (P3).
    val keyed = raw.withColumn("trip_key", Trip.tripKey)
    catalog.overwrite(StagingTable, keyed) // staging holds exactly this batch
    // INSERT ... ON CONFLICT DO NOTHING (J3): dedup upsert into hist.
    val stg = catalog.read(StagingTable)
    val hist = catalog.read(HistTable)
    catalog.append(HistTable, Upsert.newRows(stg, hist, "trip_key"))
    // TRUNCATE staging (S5).
    catalog.truncate(StagingTable)
    // REFRESH MATERIALIZED VIEW (S6).
    refreshSummarizedView()
  }

  /** Materialized-view refresh: recompute + overwrite (SURVEY.md §1.4). */
  def refreshSummarizedView(): Unit = {
    val hist = catalog.read(HistTable)
    catalog.overwrite(ViewTable, TripQueries.weeklyAvgTripsPerRegion(hist))
  }

  def hist: DataFrame = catalog.read(HistTable)
  def summarized: DataFrame = catalog.read(ViewTable)

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
