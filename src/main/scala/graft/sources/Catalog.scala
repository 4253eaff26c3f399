package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table lifecycle for the staging / historical / summary layer
  * (reference S5/S6/S7).
  *
  * The reference keeps its tables in Postgres; we keep them as parquet
  * tables under a warehouse root. Semantics preserved:
  *  - `CREATE TABLE IF NOT EXISTS` with a fixed schema ahead of data
  *    (src/sqls/create_objects.sql:2-19)  -> [[ensureTable]]
  *  - `TRUNCATE TABLE`                    -> [[truncate]] (overwrite empty)
  *  - materialized-view refresh           -> recompute + [[overwrite]]
  *
  * Scale note: every write goes through Spark's commit protocol, so a
  * 1000-executor append is atomic per job; `refreshByPath` after overwrite
  * keeps any cached file listings coherent.
  */
final class Catalog(spark: SparkSession, warehouse: String) {

  def path(table: String): String = s"$warehouse/$table"

  def exists(table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** CREATE TABLE IF NOT EXISTS: materialize an empty parquet dataset with
    * the declared schema so downstream readers never infer.
    */
  def ensureTable(table: String, schema: StructType): Unit =
    if (!exists(table)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode(SaveMode.Overwrite).parquet(path(table))
    }

  /** CREATE TABLE IF NOT EXISTS for a hive-partitioned table: an empty
    * partitioned write leaves only the directory + _SUCCESS (no root
    * data files, which would conflict with partition discovery), so
    * readers must supply the declared schema via [[readWithSchema]].
    */
  def ensurePartitionedTable(
      table: String,
      schema: StructType,
      partitionCols: Seq[String]): Unit =
    if (!exists(table)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path(table))
    }

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  /** Read with the declared schema — required for partitioned tables that
    * may be empty (no files to infer from), and generally the
    * schema-first discipline the reference argues for (README.md:35-43).
    */
  def readWithSchema(table: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path(table))

  def append(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table))

  /** Append into a hive-style partitioned layout. At scale, partition
    * columns are what turn full-table scans into pruned ones (see
    * Upsert.newRowsPruned); dynamic partition overwrite is left to
    * callers who need idempotent re-writes per partition.
    */
  def appendPartitioned(table: String, df: DataFrame, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCols: _*).parquet(path(table))

  def overwrite(table: String, df: DataFrame): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(path(table))
    spark.catalog.refreshByPath(path(table))
  }

  /** Overwrite into a hive-partitioned layout. With `dynamic = true`
    * only the partitions PRESENT in `df` are replaced (Spark's dynamic
    * partition overwrite) — the primitive behind incremental
    * materialized-view refresh: recompute the touched partitions,
    * leave the rest untouched on disk.
    */
  def overwritePartitioned(
      table: String,
      df: DataFrame,
      partitionCols: Seq[String],
      dynamic: Boolean = false): Unit = {
    df.write
      .option("partitionOverwriteMode", if (dynamic) "dynamic" else "static")
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path(table))
    spark.catalog.refreshByPath(path(table))
  }

  /** TRUNCATE TABLE: overwrite with an empty frame of the same schema
    * (src/sqls/populate_postgres.sql:31).
    */
  def truncate(table: String): Unit = {
    val schema = read(table).schema
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode(SaveMode.Overwrite).parquet(path(table))
    spark.catalog.refreshByPath(path(table))
  }
}
