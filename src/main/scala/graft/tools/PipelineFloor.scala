package graft.tools

import graft.GraftSession

/** Floor decomposition for the `pipeline` bench composite — the
  * StreamFloor discipline applied to the batch DAG: replay the SAME
  * 3-batch + compaction shape (CSV ingest → trip_key → date-pruned
  * dedup upsert → incremental matview refresh → compaction) at two
  * batch volumes, the composite's 20 000 rows and a 10-row floor. The
  * floor time is the irreducible per-batch machinery (session/catalog
  * setup, Derby JDBC round-trip, commit protocol, refresh planning ×3
  * batches + compaction) that no operator change can remove; the
  * difference is the actual data work. Writes
  * scale/pipeline_floor.json.
  *
  * Run: `tools/run.sh graft.tools.PipelineFloor`
  */
object PipelineFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-pipeline-floor", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def once(rows: Int): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft-pipe-floor").toString
      def csv(name: String, n: Int, offset: Int): String = {
        val p = s"$dir/$name.csv"
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
          TripPipelineDemo.syntheticCsv(n, offset, tsHeader = "date_time"))
        p
      }
      val b1 = csv("b1", rows, 0)
      val b2 = csv("b2", rows, rows / 2)
      val t0 = System.nanoTime()
      val pipe = new graft.Pipeline(spark, s"$dir/warehouse")
      pipe.runBatch(b1)
      pipe.runBatch(b1)
      pipe.runBatch(b2)
      pipe.compactHist(maxFilesPerPartition = 1)
      (System.nanoTime() - t0) / 1e9
    }
    // min-of-2 cold (the StreamFloor estimator): fresh scratch dirs per
    // attempt, exactly like the bench composite's attempts
    def min2(label: String, rows: Int): Double = {
      scrub(); val a = once(rows)
      scrub(); val b = once(rows)
      val t = math.min(a, b)
      println(f"[floor] $label%-16s $t%6.2f s (runs $a%.2f / $b%.2f)")
      t
    }
    val full = min2("pipeline-20k", 20000)
    val floor = min2("pipeline-10row", 10)
    val json =
      f"""{"pipeline_20k_sec": $full%.2f, "pipeline_10row_floor_sec": $floor%.2f, "note": "same 3-batch + compaction DAG as the bench pipeline composite; floor = per-batch machinery (catalog setup, JDBC round-trip, commit protocol, refresh planning), difference = data work on 20k-row batches"}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("scale"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scale/pipeline_floor.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
