package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (build plan §7.2 step 7). Three tiers:
  *
  *  - [[bruteForceTopK]]: exact top-k by cosine/dot — the correctness
  *    baseline. The query side is broadcast (queries are few), so the
  *    corpus is scanned exactly once with no shuffle of the vectors; the
  *    only shuffle carries (query_id, candidate_id, score) pairs into the
  *    per-query top-k, which TakeOrdered keeps bounded.
  *  - [[hyperplaneBucket]] LSH: sign-bit bucketing under deterministic
  *    pseudo-random hyperplanes; restricts candidate generation to
  *    same-bucket vectors — the scale path when the corpus side is 100 TB
  *    (bucket id becomes the shuffle/partition key).
  *  - [[ivfTopK]]: IVF-style — k-means-lite centroids sampled
  *    deterministically from the corpus, vectors assigned to their nearest
  *    centroid, queries probe the `nprobe` nearest centroid cells only.
  *
  * All scoring goes through the codegen'd [[graft.functions.DotF]]
  * expression — no boxing on the hot path.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector, ranked by dot product
    * (or cosine), ties broken by ascending candidate id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      metric: String = "cosine",
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("qv"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("cv"))
    val score = metric match {
      case "dot" => VectorFunctions.dot(F.col("qv"), F.col("cv"))
      case _     => VectorFunctions.cosineFast(F.col("qv"), F.col("cv"))
    }
    val scored = c.join(F.broadcast(q))
      .filter(if (excludeSelf) F.col("query_id") =!= F.col("neighbor_id") else F.lit(true))
      .select(F.col("query_id"), F.col("neighbor_id"), score.as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("score").desc, F.col("neighbor_id").asc)
    scored
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id: `bits` sign bits, each from a
    * deterministic pseudo-random hyperplane. Plane components are derived
    * from xxhash64(dim, seed=bit) scaled to [-1, 1] — fully reproducible
    * across engines and runs with no stored model.
    */
  def hyperplaneBucket(vec: Column, bits: Int): Column = {
    val dims = F.sequence(F.lit(0), F.size(vec) - 1)
    val bitVals = (0 until bits).map { b =>
      val proj = F.aggregate(
        F.zip_with(vec, dims, (x, i) =>
          x.cast("double") * planeComponent(i, b)),
        F.lit(0.0), (acc, v) => acc + v)
      F.when(proj >= 0, F.lit(1L << b)).otherwise(F.lit(0L))
    }
    bitVals.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Deterministic pseudo-random plane component in [-1, 1): xxhash64 of
    * (dimension, bit) mapped through a fixed affine transform.
    */
  private def planeComponent(dim: Column, bit: Int): Column =
    (F.pmod(F.xxhash64(dim, F.lit(bit)), F.lit(2000001L)).cast("double")
      / F.lit(1000000.0)) - F.lit(1.0)

  /** ANN via hyperplane LSH: queries and corpus bucketed identically;
    * candidates come only from the query's bucket. Recall is tuned by
    * `bits` (fewer bits -> bigger buckets -> higher recall, more work).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      bits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("cv"))
      .withColumn("bk", hyperplaneBucket(F.col("cv"), bits))
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("qv"))
      .withColumn("bk", hyperplaneBucket(F.col("qv"), bits))
    val scored = c.join(F.broadcast(q), Seq("bk"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.cosineFast(F.col("qv"), F.col("cv")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("score").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
  }

  /** IVF-style ANN: `nlist` centroids picked deterministically (every
    * n/nlist-th vector by id — a k-means++ seeding stand-in that needs no
    * iteration), corpus assigned to nearest centroid once, queries probe
    * the `nprobe` nearest cells. At scale the assignment is the only
    * corpus-wide pass; probes touch nlist/nprobe of the data.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("cv"))
    // Deterministic centroid sample: rank by id, take every (n/nlist)-th.
    val n = c.count()
    val step = math.max(n / nlist, 1L)
    val cents = c
      .filter(F.pmod(F.col("neighbor_id"), F.lit(step)) === 0)
      .limit(nlist)
      .select(F.col("neighbor_id").as("cent_id"), F.col("cv").as("centv"))
    val centB = F.broadcast(cents)
    // Assign each corpus vector to its nearest centroid (by dot).
    val wAssign = Window.partitionBy("neighbor_id")
      .orderBy(F.col("cscore").desc, F.col("cent_id").asc)
    val assigned = c.join(centB)
      .select(F.col("neighbor_id"), F.col("cv"), F.col("cent_id"),
        VectorFunctions.dot(F.col("cv"), F.col("centv")).as("cscore"))
      .withColumn("r", F.row_number().over(wAssign))
      .filter(F.col("r") === 1)
      .select("neighbor_id", "cv", "cent_id")
    // Each query probes its nprobe nearest cells.
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("qv"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(F.col("cscore").desc, F.col("cent_id").asc)
    val probes = q.join(centB)
      .select(F.col("query_id"), F.col("qv"), F.col("cent_id"),
        VectorFunctions.dot(F.col("qv"), F.col("centv")).as("cscore"))
      .withColumn("r", F.row_number().over(wProbe))
      .filter(F.col("r") <= nprobe)
      .select("query_id", "qv", "cent_id")
    val scored = assigned.join(F.broadcast(probes), Seq("cent_id"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.cosineFast(F.col("qv"), F.col("cv")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("score").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
  }
}
