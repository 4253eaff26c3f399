package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.GraftSession

/** Deterministic local scale-up of the driver's testdata: replicate a
  * source scale-factor directory `factor`× with REPLICA-DISJOINT keys,
  * vocabulary, and vector clouds, so that every structural property the
  * operators are sensitive to scales LINEARLY:
  *
  *   - fact/dim keys (`l_orderkey`, `o_custkey`, `user_id`, ...) shift
  *     by `replica * (max_key + 1)` — replica r's facts reference
  *     replica r's dims, so join fan-outs are unchanged and total join
  *     output is exactly `factor`× the source;
  *   - document words get a per-replica suffix (`batch` -> `batchq3`),
  *     making replica vocabularies disjoint: within-replica shingle/
  *     near-dup structure is IDENTICAL to the source, cross-replica
  *     similarity is zero, so candidate-pair counts scale `factor`×
  *     (naive replication would instead grow pairs quadratically in
  *     `factor` and masquerade as an operator scaling failure);
  *   - embedding vectors get per-replica deterministic noise
  *     (xxhash64-derived, then re-normalized to unit L2) so replica
  *     clouds occupy distinct regions: ANN near-dup pair counts stay
  *     linear while IVF/PQ training sees a `factor`×-larger corpus;
  *   - `nation`/`region` stay fixed (TPC-H semantics: they never scale).
  *
  * Everything is a pure column transform — no collects, no shuffles
  * except the final file-count repartition — so the same tool would
  * scale a 10 TB source on a cluster.
  *
  * Run: `sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf1 10"`.
  */
object ScaleUp {

  /** max(col)+1 — the per-replica key stride (collected once per table;
    * model-sized driver data: a single long).
    */
  private def stride(df: DataFrame, col: String): Long =
    df.agg(F.max(F.col(col).cast("long"))).head().getLong(0) + 1L

  /** Shift integral key columns by `r * stride(col)`, preserving type. */
  private def shiftKeys(df: DataFrame, r: Int, strides: Map[String, Long]): DataFrame =
    strides.foldLeft(df) { case (d, (c, s)) =>
      val t = d.schema(c).dataType.sql
      d.withColumn(c, (F.col(c).cast("long") + F.lit(r * s)).cast(t))
    }

  /** Per-replica word suffix: every whitespace token in `col` gets a
    * replica tag (replica 0 is the untouched source). Empty tokens from
    * trailing separators stay empty so the token count is unchanged.
    */
  private def suffixWords(df: DataFrame, col: String, r: Int): DataFrame =
    if (r == 0) df
    else df.withColumn(col, F.expr(
      s"concat_ws(' ', transform(split($col, ' '), w -> CASE WHEN w = '' THEN w ELSE concat(w, 'q$r') END))"))

  /** Per-replica deterministic vector jitter, re-normalized to unit L2
    * (the source cloud is unit-norm; ANN ops equate cosine with dot).
    * Noise is uniform-ish in ±0.3 per dim from xxhash64(id, dim, r) —
    * far past any near-dup threshold, so replica clouds never pair.
    */
  private def jitterVectors(df: DataFrame, idCol: String, vecCol: String, r: Int): DataFrame =
    if (r == 0) df
    else df
      .withColumn("__nv", F.expr(
        s"transform($vecCol, (x, i) -> cast(x as double) + cast(pmod(xxhash64($idCol, i, $r), 2001) - 1000 as double) / 1000.0 * 0.3)"))
      .withColumn("__norm", F.expr(
        "sqrt(aggregate(__nv, cast(0 as double), (a, x) -> a + x * x))"))
      .withColumn(vecCol, F.expr(
        "transform(__nv, x -> cast(x / __norm as float))"))
      .drop("__nv", "__norm")

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "localdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-scaleup", cpus)

    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // one stride per key FAMILY, shared by every table referencing it, so
    // fact->dim references stay aligned within each replica
    val sOrder = stride(rd("orders"), "o_orderkey")
    val sCust = stride(rd("customer"), "c_custkey")
    val sPart = stride(rd("part"), "p_partkey")
    val sSupp = stride(rd("supplier"), "s_suppkey")
    val sEvent = stride(rd("events"), "event_id")
    val sUser = stride(rd("events"), "user_id")
    val sDoc = stride(rd("documents"), "doc_id")
    val sVec = stride(rd("embeddings"), "vec_id")

    def replicate(name: String, outFiles: Int)(one: (DataFrame, Int) => DataFrame): Unit = {
      val base = rd(name)
      val all = (0 until factor).map(r => one(base, r)).reduce(_ unionByName _)
      all.repartition(outFiles)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> ${factor}x, $outFiles files")
    }

    replicate("lineitem", 4 * factor) { (d, r) =>
      shiftKeys(d, r, Map("l_orderkey" -> sOrder, "l_partkey" -> sPart, "l_suppkey" -> sSupp))
    }
    replicate("orders", factor) { (d, r) =>
      shiftKeys(d, r, Map("o_orderkey" -> sOrder, "o_custkey" -> sCust))
    }
    replicate("customer", math.max(2, factor / 2)) { (d, r) =>
      shiftKeys(d, r, Map("c_custkey" -> sCust))
    }
    replicate("part", math.max(2, factor / 2)) { (d, r) =>
      shiftKeys(d, r, Map("p_partkey" -> sPart))
    }
    replicate("supplier", 2) { (d, r) =>
      shiftKeys(d, r, Map("s_suppkey" -> sSupp))
    }
    replicate("events", factor) { (d, r) =>
      shiftKeys(d, r, Map("event_id" -> sEvent, "user_id" -> sUser))
    }
    replicate("documents", factor) { (d, r) =>
      val shifted = shiftKeys(d, r, Map("doc_id" -> sDoc))
      suffixWords(shifted, "text", r)
        .withColumn("n_chars", F.length(F.col("text")).cast("long"))
    }
    replicate("embeddings", factor) { (d, r) =>
      jitterVectors(shiftKeys(d, r, Map("vec_id" -> sVec)), "vec_id", "embedding", r)
    }
    // nation/region never scale: copy as-is so the dir is self-contained
    Seq("nation", "region").foreach { name =>
      rd(name).coalesce(1).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> copied")
    }
    spark.stop()
  }
}
