package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashes/floats are
    * engine-specific -> driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
