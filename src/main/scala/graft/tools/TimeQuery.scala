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
    // per-run stage/task profile: where a wall-clock delta has no
    // byte-level cause, the fixed-cost ledger (stages launched, tasks
    // launched, summed task wall) usually names it
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val perStage = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
          Option(e.stageInfo.taskMetrics).foreach { m =>
            taskMs.addAndGet(m.executorRunTime)
            perStage.add((e.stageInfo.name.takeWhile(_ != '\n').take(60),
              e.stageInfo.numTasks, m.executorRunTime,
              m.jvmGCTime))
          }
        }
      })
    (1 to runs).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(300)
      println(f"[timequery] $name run$i $sec%.2f s " +
        s"stages=${stages.get} tasks=${tasks.get} taskSumMs=${taskMs.get}")
      if (i == runs) {
        import scala.jdk.CollectionConverters._
        perStage.asScala.toSeq.sortBy(-_._3).take(8).foreach {
          case (n, t, ms, gc) =>
            println(s"[timequery]   stage '$n' tasks=$t runMs=$ms gcMs=$gc")
        }
      }
      perStage.clear()
    }
    spark.stop()
  }
}
