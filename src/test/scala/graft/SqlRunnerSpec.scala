package graft

import java.nio.file.Files
import graft.operators.TripQueries
import graft.tools.TripPipelineDemo

/** Reference entry-point 3 (SURVEY.md §3): ad-hoc SQL text must produce
  * the same results as the typed DSL for the canonical queries. The SQL
  * below states the same computation as the reference's .sql files
  * (week-of-month spelled with this engine's registered function).
  */
class SqlRunnerSpec extends SparkSpec {

  private lazy val pipe: Pipeline = {
    val dir = Files.createTempDirectory("graft-sql").toString
    val csv = s"$dir/trips.csv"
    Files.writeString(java.nio.file.Paths.get(csv), TripPipelineDemo.syntheticCsv(100))
    val p = new Pipeline(spark, s"$dir/warehouse")
    p.runBatch(csv)
    p.hist.createOrReplaceTempView("hist_trip_data")
    p
  }

  test("SQL text and DSL agree on regions-with-datasource") {
    pipe // force init
    val sql = SqlRunner.run(spark,
      """SELECT region FROM hist_trip_data
        |WHERE datasource = 'cheap_mobile'
        |GROUP BY region""".stripMargin)
      .collect().map(_.getString(0)).sorted.toSeq
    val dsl = TripQueries.regionsWithDatasource(pipe.hist)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(sql === dsl)
  }

  test("SQL text and DSL agree on the latest-datasource CTE chain") {
    pipe
    val sql = SqlRunner.run(spark,
      """WITH regions AS (
        |  SELECT region, count(*) AS appearance FROM hist_trip_data GROUP BY region),
        |recurring_regions AS (
        |  SELECT region FROM regions ORDER BY appearance DESC LIMIT 2),
        |latest_datasource AS (
        |  SELECT max(cast(htd.date_time AS timestamp)) AS last_occurence
        |  FROM recurring_regions rr JOIN hist_trip_data htd ON rr.region = htd.region)
        |SELECT datasource FROM hist_trip_data htd
        |JOIN latest_datasource ltd
        |  ON cast(htd.date_time AS timestamp) = ltd.last_occurence""".stripMargin)
      .collect().map(_.getString(0)).sorted.toSeq
    val dsl = TripQueries.latestDatasourceOfTopRegions(pipe.hist)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(sql === dsl)
  }

  test("SQL text weekly view with registered week_of_month equals the DSL view") {
    pipe
    val sql = SqlRunner.run(spark,
      """SELECT wa.region, wa.week_of_month, ceil(avg(count)) AS weekly_avg
        |FROM (SELECT region,
        |        concat(date_format(cast(date_time AS date), 'yyyy-MM'),
        |               '-0', week_of_month(cast(date_time AS date))) AS week_of_month,
        |        count(*) AS count
        |      FROM hist_trip_data
        |      GROUP BY region,
        |        concat(date_format(cast(date_time AS date), 'yyyy-MM'),
        |               '-0', week_of_month(cast(date_time AS date)))) wa
        |GROUP BY wa.region, wa.week_of_month""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val dsl = TripQueries.weeklyAvgTripsPerRegion(pipe.hist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sql === dsl)
  }

  test("driver contract: every oracle belongs to a query, names unique") {
    val qNames = graft.queries.QueryCatalog.all.map(_.name)
    assert(qNames.distinct.size === qNames.size, "duplicate query names")
    // the correctness gate is only as wide as the oracle set: no graded
    // query may silently lose its oracle
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet,
      "rows-only queries reappeared: " +
        (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet))
  }

  test("SQL-only users can run the sketch/dedup family through ad-hoc text") {
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"),
        (3L, "completely different text about something else"))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_docs")
    // the md5-reproducible sketch pipeline spelled entirely in SQL —
    // no Scala API involved (reference entry-point 3 + §2.9 UDF story)
    val dups = SqlRunner.run(spark,
      """WITH sigs AS (
        |  SELECT doc_id,
        |    md5_minhash_sig(regexp_replace(lower(trim(text)), '\\s+', ' '), 5, 16) AS sig,
        |    char_shingles(regexp_replace(lower(trim(text)), '\\s+', ' '), 5) AS sh
        |  FROM sql_docs)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  size(array_intersect(a.sh, b.sh)) AS inter
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND a.sig = b.sig
        |""".stripMargin).collect()
    assert(dups.length === 1)
    assert(dups.head.getLong(0) === 1L && dups.head.getLong(1) === 2L)
    assert(dups.head.getInt(2) > 0)
  }
}
