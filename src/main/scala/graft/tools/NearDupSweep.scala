package graft.tools

import org.apache.spark.sql.{functions => F}
import graft.GraftSession

/** Threshold/band sweep for [[graft.operators.Dedup.embeddingNearDups]]
  * at a fixed corpus: the 100× probe shows wall time tracking OUTPUT
  * volume (above-threshold pairs grow quadratically with cloud density
  * at a fixed threshold — a data law, not an operator property). This
  * tool measures the operating curve: tightening the cosine threshold
  * and/or widening the LSH bands must pull cost back to ~linear, which
  * is exactly the knob a 100 TB deployment turns as density grows.
  *
  * Usage: NearDupSweep <dir> [num/den:bits:tables ...]
  * Output: scale/neardup_sweep_<tag>.json
  */
object NearDupSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "localdata/sf10"
    val configs: Seq[(Int, Int, Int, Int)] =
      if (args.length > 1) args.drop(1).toSeq.map { s =>
        val Array(thr, bits, tables) = s.split(":")
        val Array(num, den) = thr.split("/")
        (num.toInt, den.toInt, bits.toInt, tables.toInt)
      }
      else Seq((2, 5, 4, 4), (1, 2, 6, 4), (3, 5, 8, 4), (7, 10, 10, 4))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-neardup-sweep", cpus)
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = embs.count()
    val results = configs.map { case (num, den, bits, tables) =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.embeddingNearDups(
        embs, thresholdNum = num, thresholdDen = den,
        bits = bits, tables = tables).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] cos>=$num/$den bits=$bits tables=$tables: $pairs%10d pairs $sec%8.2f s")
      f"""  {"threshold": "$num/$den", "bits": $bits, "tables": $tables, "pairs": $pairs, "sec": $sec%.2f}"""
    }
    val tag = new java.io.File(dir).getName
    val json =
      s"""{"dir": "$dir", "n_vecs": $nVecs, "sweep": [\n${results.mkString(",\n")}\n]}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("scale"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"scale/neardup_sweep_$tag.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
