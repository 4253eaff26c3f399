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
    *
    * Uses the engine's bounded [[graft.functions.TopKPairs]] aggregate:
    * every map task reduces its corpus slice to <= k candidates per query
    * before the shuffle, so the exchange carries k-element sketches
    * instead of |corpus| scored rows (a window row_number() would shuffle
    * and sort them all).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      metric: String = "cosine",
      excludeSelf: Boolean = true): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    // Norms are precomputed per row BEFORE the pair join: cosine then
    // costs one dot per pair instead of three.
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("qv"))
      .withColumn("qn", F.sqrt(VectorFunctions.dot(F.col("qv"), F.col("qv"))))
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("cv"))
      .withColumn("cn", F.sqrt(VectorFunctions.dot(F.col("cv"), F.col("cv"))))
    val score = metric match {
      case "dot" => VectorFunctions.dot(F.col("qv"), F.col("cv"))
      case _ => VectorFunctions.dot(F.col("qv"), F.col("cv")) /
        F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0))
    }
    val scored = c.join(F.broadcast(q))
      .filter(if (excludeSelf) F.col("query_id") =!= F.col("neighbor_id") else F.lit(true))
      .select(F.col("query_id"), F.col("neighbor_id"), score.as("score"))
    explodeTopK(scored, k)
  }

  /** groupBy + bounded top-k aggregate + posexplode -> one row per
    * (query, neighbor, rank), best first.
    */
  private[graft] def explodeTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(graft.functions.TopK.topkPairs(
        F.col("score").cast("double"), F.col("neighbor_id"), k).as("top"))
      .select(F.col("query_id"), F.posexplode(F.col("top")).as(Seq("pos", "p")))
      .select(
        F.col("query_id"),
        F.col("p.id").as("neighbor_id"),
        F.col("p.score").as("score"),
        (F.col("pos") + 1).cast("int").as("rank"))

  /** Window-based variant kept for cross-checking the aggregate in specs. */
  def bruteForceTopKWindow(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("qv"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("cv"))
    val scored = c.join(F.broadcast(q))
      .filter(if (excludeSelf) F.col("query_id") =!= F.col("neighbor_id") else F.lit(true))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.cosineFast(F.col("qv"), F.col("cv")).as("score"))
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
    graft.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("cv"))
      .withColumn("bk", hyperplaneBucket(F.col("cv"), bits))
      .withColumn("cn", F.sqrt(VectorFunctions.dot(F.col("cv"), F.col("cv"))))
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("qv"))
      .withColumn("bk", hyperplaneBucket(F.col("qv"), bits))
      .withColumn("qn", F.sqrt(VectorFunctions.dot(F.col("qv"), F.col("qv"))))
    val scored = c.join(F.broadcast(q), Seq("bk"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        (VectorFunctions.dot(F.col("qv"), F.col("cv")) /
          F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0))).as("score"))
    graft.GraftFunctions.register(corpus.sparkSession)
    explodeTopK(scored, k)
  }

  /** IVF-style ANN: `nlist` centroids picked deterministically (every
    * n/nlist-th vector by id — a k-means++ seeding stand-in that needs no
    * iteration), corpus assigned to nearest centroid once, queries probe
    * the `nprobe` nearest cells.
    *
    * The centroid table is collected to the driver (it is a MODEL — nlist
    * vectors, like k-means centers) and inlined as a literal, so corpus
    * assignment is a map-only pass with zero shuffle: per row, `nlist`
    * codegen'd dot products and an inline argmax. The only shuffle in the
    * whole operator is the cell-id probe join, which carries candidate
    * rows, not the corpus.
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
    // Deterministic centroid sample: every (n/nlist)-th vector by id.
    val n = c.count()
    val step = math.max(n / nlist, 1L)
    val centRows = c
      .filter(F.pmod(F.col("neighbor_id"), F.lit(step)) === 0)
      .orderBy("neighbor_id")
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1))
    val cents: Column = F.typedlit(centRows.map(_.toSeq).toSeq)

    /** Scores of `v` against every centroid (array<double>, map-only). */
    def cellScores(v: Column): Column =
      F.transform(cents, cent =>
        F.aggregate(
          F.zip_with(v, cent, (x, y) => x.cast("double") * y.cast("double")),
          F.lit(0.0), (acc, p) => acc + p))

    /** Index of the best cell — first position of the max score (1-based
      * array_position makes the tie-break deterministic: lowest cell id).
      */
    def bestCell(v: Column): Column = {
      val scores = cellScores(v)
      (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    }

    /** Top-`nprobe` cell ids by score (desc), ties to lower id: sort
      * struct(-score, idx) ascending and slice.
      */
    def probeCells(v: Column): Column =
      F.slice(
        F.transform(
          F.array_sort(
            F.zip_with(cellScores(v), F.sequence(F.lit(0), F.lit(nlist - 1)),
              (s, i) => F.struct((-s).as("neg"), i.as("idx")))),
          x => x.getField("idx")),
        1, nprobe)

    val assigned = c.withColumn("cell", bestCell(F.col("cv")))
    val probes = queries
      .select(F.col(idCol).as("query_id"), F.col(vecCol).as("qv"))
      .withColumn("cell", F.explode(probeCells(F.col("qv"))))
    val scored = assigned
      .withColumn("cn", F.sqrt(VectorFunctions.dot(F.col("cv"), F.col("cv"))))
      .join(F.broadcast(
        probes.withColumn("qn", F.sqrt(VectorFunctions.dot(F.col("qv"), F.col("qv"))))),
        Seq("cell"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        (VectorFunctions.dot(F.col("qv"), F.col("cv")) /
          F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0))).as("score"))
      // a probe can hit the same neighbor through multiple cells
      .dropDuplicates("query_id", "neighbor_id")
    explodeTopK(scored, k)
  }
}
