package graft

import java.nio.file.Files
import graft.sources.JdbcSink

/** Executes the JDBC sink for real against an embedded Derby database
  * (on the Spark classpath), mirroring the reference's secondary load
  * path (insert_postgres.py): append-mode executor-partition writes,
  * then a read-back through the same JDBC source.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def readBack(url: String, table: String) =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", derbyDriver)
      .load()

  test("jdbc sink round-trips a DataFrame through embedded Derby and appends") {
    System.setProperty("derby.stream.error.file", "/tmp/derby-test.log")
    val db = Files.createTempDirectory("graft-derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val df = Seq(
      (1L, "region-a", "2024-01-01 10:00:00", 1.5),
      (2L, "region-b", "2024-01-01 11:00:00", 2.5))
      .toDF("id", "region", "date_time", "score")

    JdbcSink.write(df, url, "stg_trip_data", user = "app", password = "app",
      driver = derbyDriver, numPartitions = 2, extraOptions = Map.empty)
    val once = readBack(url, "stg_trip_data")
    assert(once.count() === 2)

    // string-type coercion: VARCHAR and DOUBLE columns survive the trip
    val row = once.orderBy("id").collect().head
    assert(row.getLong(0) === 1L)
    assert(row.getString(1) === "region-a")
    assert(row.getString(2) === "2024-01-01 10:00:00")
    assert(row.getDouble(3) === 1.5)

    // append mode is a plain INSERT (reference semantics): rows double
    JdbcSink.write(df, url, "stg_trip_data", user = "app", password = "app",
      driver = derbyDriver, numPartitions = 2, extraOptions = Map.empty)
    assert(readBack(url, "stg_trip_data").count() === 4)
  }

  test("sizedForWrite caps wide frames with a shuffle, never coalesce") {
    import org.apache.spark.sql.catalyst.plans.logical.Repartition
    val wide = spark.range(1000).repartition(32).toDF("id")
    val sized = JdbcSink.sizedForWrite(wide, 8)
    assert(sized.rdd.getNumPartitions === 8)
    // a shuffling Repartition (not coalesce) caps ONLY the write side;
    // coalesce(8) would propagate up and run the whole upstream stage
    // at 8 tasks
    val reps = sized.queryExecution.logical.collect { case r: Repartition => r }
    assert(reps.nonEmpty && reps.forall(_.shuffle), sized.queryExecution.logical.toString)
    // a narrow frame still lands exactly at the cap (the sizing is
    // unconditional — probing the width would execute the plan twice)
    val narrow = spark.range(10).repartition(4).toDF("id")
    assert(JdbcSink.sizedForWrite(narrow, 8).rdd.getNumPartitions === 8)
  }
}
