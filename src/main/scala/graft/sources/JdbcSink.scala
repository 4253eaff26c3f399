package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC sink (reference S3): the reference's distributed load path writes
  * each executor partition over JDBC to `public.stg_trip_data`
  * (src/insert_postgres.py:13-22, driver options incl.
  * stringtype=unspecified so the target coerces VARCHARs).
  *
  * Kept as a thin, configurable sink: file-based ingestion is the primary
  * path (the reference itself calls the JDBC route secondary,
  * README.md:147). No Postgres driver ships in this environment, so the
  * executed round-trip test (JdbcSinkSpec) runs against embedded Derby —
  * same Spark JDBC write path, different dialect.
  *
  * Scale note: `numPartitions` caps concurrent connections — at 1000
  * executors an uncapped JDBC write is a denial of service on the target;
  * `batchsize` amortizes round-trips.
  */
object JdbcSink {

  def write(
      df: DataFrame,
      url: String,
      table: String,
      user: String,
      password: String,
      driver: String = "org.postgresql.Driver",
      mode: SaveMode = SaveMode.Append,
      numPartitions: Int = 8,
      batchSize: Int = 10000,
      extraOptions: Map[String, String] = Map("stringtype" -> "unspecified")): Unit = {
    var w = sizedForWrite(df, numPartitions).write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("driver", driver)
      .option("batchsize", batchSize.toString)
    extraOptions.foreach { case (k, v) => w = w.option(k, v) }
    w.mode(mode).save()
  }

  /** Cap a frame at `n` write partitions WITHOUT collapsing upstream
    * parallelism: `coalesce(n)` propagates up through narrow stages, so
    * the entire compute stage feeding the sink would run at n tasks —
    * at cluster scale that serializes the whole job onto n cores, not
    * just the writes. `repartition(n)` costs one round-robin shuffle
    * and leaves the upstream plan at full width. Unconditional on
    * purpose: probing the current partition count (`df.rdd`) would
    * materialize every upstream AQE stage once just to read a number,
    * then the write would execute the query AGAIN — one avoidable
    * shuffle beats one avoidable full re-execution.
    */
  private[graft] def sizedForWrite(df: DataFrame, n: Int): DataFrame =
    df.repartition(n)
}
