package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftFunctions, GraftSession, SparkEntry}

/** Ad-hoc single-query timer: run one catalog query N times against a
  * data dir under optional SQL-conf overrides, printing per-run seconds
  * and the executed-plan partition profile — the local tool for
  * adjudicating plan/conf hypotheses (AQE coalesce targets, broadcast
  * thresholds) that the full Bench/ScaleProbe sweeps are too coarse for.
  *
  * Usage: TimeQuery <sfDir> <queryName> [runs] [k=v ...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val confs = args.drop(3).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-timequery", cpus)
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    GraftFunctions.register(spark)
    (1 to runs).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[timequery] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
