package graft.tools

import graft.{GraftFunctions, GraftSession, SparkEntry}

/** Print the COMPLETE final physical plan of one catalog query (no
  * truncation — ExplainDump caps at 4000 chars for the PLANS.md digest).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val spark = GraftSession.local("graft-explain-one", 4)
    GraftFunctions.register(spark)
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
