package graft.tools

import org.apache.spark.sql.{functions => F}
import graft.GraftSession

/** Prints [[graft.operators.Dedup.autoBandBits]]' decision inputs and
  * pick for each given sf dir — the validation tool for the
  * density-adaptive near-dup operating point: run it against the scaled
  * embedding clouds and compare the picks with the measured cost curve
  * in `scale/neardup_sweep_sf10.json` (the picker should land where the
  * curve bottoms).
  *
  * Run: `tools/run.sh graft.tools.NearDupAutoProbe /root/testdata/sf0.01 localdata/sf10`
  */
object NearDupAutoProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-neardup-auto-probe", cpus)
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val rows = dirs.map { dir =>
      val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = embs.count()
      // replicate the picker's internals for visibility (same sample,
      // same probe resolution), then ask the picker itself
      val u = F.conv(F.substring(
        F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
      def occ = embs.filter(u % 16 === 0)
        .select(graft.functions.VectorFunctions.quantize(F.col("embedding")).as("qv"))
        .select(graft.operators.Similarity.planeBucket(F.col("qv"), 12, 0, 64).as("bk"))
        .groupBy("bk").agg(F.count(F.lit(1)).as("c"))
      def mass(df: org.apache.spark.sql.DataFrame): Long = df
        .agg(F.coalesce(F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0L)))
        .head().getLong(0)
      val cHi = mass(occ)
      val cLo = mass(occ.groupBy(F.col("bk") % 256L).agg(F.sum("c").as("c")))
      val bg = (cLo - cHi).max(0L)
      val pick = graft.operators.Dedup.autoBandBits(embs)
      println(f"[auto] $dir%-28s n=$n%9d  C12=$cHi%9d  C8=$cLo%9d  bg=$bg%9d (x256=${bg * 256L}%12d)  rhs=${15L * 450L * n}%12d  pick=$pick%2d bits")
      f""""$dir": {"n": $n, "c_hi12": $cHi, "c_lo8": $cLo, "bg_sample": $bg, "bg_scaled": ${bg * 256L}, "rhs": ${15L * 450L * n}, "pick_bits": $pick}"""
    }
    val json = rows.mkString("{", ", ", "}")
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("scale"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scale/neardup_auto_pick.json"), json + "\n")
    spark.stop()
  }
}
