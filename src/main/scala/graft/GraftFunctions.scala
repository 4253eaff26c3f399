package graft

import org.apache.spark.sql.SparkSession
import graft.functions.{VectorFunctions, WeekOfMonth}

/** Registration of the engine's custom Catalyst expressions on a session,
  * making them available to both the Column API (via call_function) and
  * SQL text (spark.sql("... week_of_month(d) ...")).
  *
  * Registration is idempotent (createOrReplaceTempFunction), so query
  * entry points call [[register]] unconditionally.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "week_of_month", WeekOfMonth.builder, "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_f", VectorFunctions.builder, "scala_udf")
  }
}
