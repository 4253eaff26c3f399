package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Trip

/** CSV trip source (reference S1/S2).
  *
  * Reproduces the reference's two ingestion quirks:
  *  - all columns land as strings — the PySpark job reads with header=true
  *    but no inferSchema (src/insert_postgres.py:20), and the DDL is all
  *    VARCHAR (src/sqls/create_objects.sql:2-19);
  *  - column binding is POSITIONAL: the CSV header says `datetime` while
  *    the table column is `date_time`; Postgres COPY maps by position
  *    (src/sqls/populate_postgres.sql:2-7). We therefore pass an explicit
  *    schema whose field names win over the file header.
  *
  * Scale note: Spark's CSV scan is vectorized and splittable for
  * uncompressed files, so a 100 TB landing directory parallelizes across
  * executors for free; the explicit schema avoids the extra
  * inferSchema pass over the data (which would double the read).
  */
object TripCsvSource {

  def read(spark: SparkSession, path: String, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", "true") // skip the header line; names come from the schema
      .option("delimiter", delimiter)
      .schema(Trip.csvSchema)   // positional bind, all StringType
      .csv(path)
}
