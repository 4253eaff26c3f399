package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftFunctions, GraftSession, SparkEntry}

/** Evidence tool for streaming-source claims the batch plan dump cannot
  * show (a twin's RETURNED frame is its grading sink — a trivial local
  * plan): run named catalog queries with a StreamingQueryListener and
  * record, per streaming query that executed, the SOURCES its progress
  * reports — e.g. proving the q_attrib_stream self-join rewrite reads
  * ONE file source per trigger where the two-source form read two.
  *
  * Run: `tools/run.sh graft.tools.StreamSourceCount /root/testdata/sf0.001
  * plans/r22 q_attrib_stream` → plans/r22/<query>_sources.txt
  */
object StreamSourceCount {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, names @ _*) = args
    val spark = GraftSession.local("graft-stream-sources", 8)
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val l = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val srcs = e.progress.sources.map(_.description).mkString("\n  ")
          seen.add(s"batch ${e.progress.batchId}: " +
            s"${e.progress.sources.length} source(s)\n  $srcs")
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(l)
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        import scala.jdk.CollectionConverters._
        Files.writeString(Paths.get(outDir, s"${name}_sources.txt"),
          seen.asScala.mkString("\n") + "\n")
        System.err.println(s"[stream-sources] wrote $name")
      } finally spark.streams.removeListener(l)
    }
    spark.stop()
  }
}
