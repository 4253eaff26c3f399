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
  *   - document text goes through a per-replica SUBSTITUTION CIPHER
  *     (letter rotation via `translate`): a bijection on the alphabet
  *     maps every replica's CHARACTER-shingle set 1:1, so within-replica
  *     Jaccard structure is exactly the source's, while any cross-replica
  *     shingle containing a letter differs — near-dup pair counts scale
  *     `factor`×, matching the driver generator's own linear trend
  *     (25→254 pairs for 500→5000 docs). A word-level tag would NOT
  *     work: character 5-grams inside untouched words keep sibling
  *     Jaccard high enough to flood the LSH bands with cross-replica
  *     pairs (measured: 214× pair growth instead of 10×);
  *   - embedding vectors get a per-replica SIGNED PERMUTATION of
  *     dimensions — an orthogonal map, so every within-replica dot
  *     product (and unit norm) is preserved bit-for-bit and ANN
  *     recall/balance metrics keep their meaning — while cross-replica
  *     cosines drop to the ~N(0, 1/√d) background. Above-threshold
  *     cross-pairs then follow the distribution's own density law
  *     (the driver's series is itself quadratic-in-density here:
  *     32→486 pairs for 500→2000 vectors at cos ≥ 0.4 in d=64);
  *   - `nation`/`region` stay fixed (TPC-H semantics: they never scale).
  *
  * Everything is a pure column transform — no collects, no shuffles
  * except the final file-count repartition — so the same tool would
  * scale a 10 TB source on a cluster.
  *
  * Run: `sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf1 10"`.
  * Optional trailing args name the only tables to build (e.g. a
  * `documents`-only sf300 for a single-family marginal-exponent probe —
  * a full sf300 is ~60 GB, the one table ~2 GB); large factors write in
  * replica chunks so the union plan stays bounded.
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

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  /** Per-replica substitution cipher: length, whitespace, token
    * boundaries, and all equality/Jaccard structure within the replica
    * are preserved exactly (any bijection on the alphabet maps shingle
    * sets 1:1); every letter-bearing character shingle differs across
    * replicas (replica 0 is the untouched source). Replicas 1-25 use
    * plain rotation (keeps previously generated 10× sets byte-stable);
    * beyond that the 26-key rotation space is exhausted, so higher
    * replicas draw a seeded full permutation of the alphabet.
    */
  private def cipherText(df: DataFrame, col: String, r: Int): DataFrame =
    if (r == 0) df
    else {
      val mapped =
        if (r < 26) alpha.drop(r) + alpha.take(r)
        else new scala.util.Random(0xa1fab37L * r).shuffle(alpha.toList).mkString
      df.withColumn(col, F.translate(F.col(col),
        alpha + alpha.toUpperCase, mapped + mapped.toUpperCase))
    }

  /** Per-replica signed permutation of vector dimensions — orthogonal,
    * so within-replica dot products and unit norms are preserved
    * bit-for-bit while replica clouds decorrelate to the random
    * background (replica 0 is the untouched source). Deterministic from
    * the replica index.
    */
  private def rotateVectors(df: DataFrame, vecCol: String, r: Int, dims: Int = 64): DataFrame =
    if (r == 0) df
    else {
      val rnd = new scala.util.Random(0x5eed0000L + r)
      val perm = rnd.shuffle((0 until dims).toVector)
      val sign = Vector.fill(dims)(if (rnd.nextBoolean()) 1.0f else -1.0f)
      df.withColumn(vecCol, F.array((0 until dims).map(i =>
        (F.col(vecCol)(perm(i)) * F.lit(sign(i))).cast("float")): _*))
    }

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "localdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val only: Set[String] = args.drop(3).toSet
    def want(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-scaleup", cpus)

    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // one stride per key FAMILY, shared by every table referencing it, so
    // fact->dim references stay aligned within each replica (lazy: a
    // table-filtered run reads only the strides its tables bind)
    lazy val sOrder = stride(rd("orders"), "o_orderkey")
    lazy val sCust = stride(rd("customer"), "c_custkey")
    lazy val sPart = stride(rd("part"), "p_partkey")
    lazy val sSupp = stride(rd("supplier"), "s_suppkey")
    lazy val sEvent = stride(rd("events"), "event_id")
    lazy val sUser = stride(rd("events"), "user_id")
    lazy val sDoc = stride(rd("documents"), "doc_id")
    lazy val sVec = stride(rd("embeddings"), "vec_id")

    def replicate(name: String, outFiles: Int)(one: (DataFrame, Int) => DataFrame): Unit = if (want(name)) {
      val base = rd(name)
      // bound the union plan: a 3000-way unionByName stalls Catalyst, so
      // replicas land in chunks of <=200 (append after the first chunk —
      // each chunk's rows are final, replicas never cross chunks). A
      // factor <=200 run is byte-identical to the historical single-shot
      // path: one chunk, overwrite, outFiles files.
      val groups = (0 until factor).grouped(200).toSeq
      groups.zipWithIndex.foreach { case (rs, gi) =>
        val part = rs.map(r => one(base, r)).reduce(_ unionByName _)
        val files = math.max(1,
          math.round(outFiles.toDouble * rs.size / factor).toInt)
        part.repartition(files)
          .write.mode(if (gi == 0) "overwrite" else "append")
          .parquet(s"$dst/$name.parquet")
      }
      println(s"[scaleup] $name -> ${factor}x, ~$outFiles files")
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
      cipherText(shiftKeys(d, r, Map("doc_id" -> sDoc)), "text", r)
    }
    replicate("embeddings", factor) { (d, r) =>
      rotateVectors(shiftKeys(d, r, Map("vec_id" -> sVec)), "embedding", r)
    }
    // nation/region never scale: copy as-is so the dir is self-contained
    Seq("nation", "region").filter(want).foreach { name =>
      rd(name).coalesce(1).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> copied")
    }
    spark.stop()
  }
}
