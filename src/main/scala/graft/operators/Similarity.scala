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

  /** Broadcast the query side only while it is actually broadcast-sized.
    *
    * Every tier's contract is "queries are few", but a caller handing in
    * a 10M-row query frame must degrade to a partitioned join, not OOM
    * the driver mid-broadcast. The count is one action over the QUERY
    * side only (columnar count, no data movement); above the threshold
    * the frame is returned unhinted and the planner shuffles both sides
    * — for the keyed tiers (LSH bucket, IVF cell) that is a standard
    * shuffle hash join, for brute force a partitioned cartesian, which
    * is the only exact plan at that query volume anyway.
    *
    * Each operator counts its RAW query input exactly once and derives
    * every downstream broadcast decision from that number (exploded
    * frames are exact multiples of it) — [[broadcastIf]] applies a
    * decision already made, so no operator pays more than one count job.
    */
  private[graft] def broadcastIf(df: DataFrame, small: Boolean): DataFrame =
    if (small) F.broadcast(df) else df

  private[graft] def broadcastIfSmall(df: DataFrame, maxRows: Long): DataFrame =
    broadcastIf(df, df.count() <= maxRows)

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
      excludeSelf: Boolean = true,
      maxBroadcastQueries: Long = 100000L): DataFrame = {
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
    val scored = c.join(broadcastIfSmall(q, maxBroadcastQueries))
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

  /** Exact top-k under the quantized-integer dot metric: vectors are
    * quantized (floor(x*1000) BIGINT) and scored with the codegen'd
    * [[graft.functions.DotL]], so every score is an exact integer any SQL
    * engine reproduces bit-for-bit — this is the oracle-checkable twin of
    * [[bruteForceTopK]], and the baseline the LSH/IVF tiers are graded
    * against.
    */
  def bruteForceTopKQuant(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeSelf: Boolean = true,
      maxBroadcastQueries: Long = 100000L): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(F.col(idCol).as("query_id"),
      VectorFunctions.quantize(F.col(vecCol)).as("qv"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"),
      VectorFunctions.quantize(F.col(vecCol)).as("cv"))
    val scored = c.join(broadcastIfSmall(q, maxBroadcastQueries))
      .filter(if (excludeSelf) F.col("query_id") =!= F.col("neighbor_id") else F.lit(true))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.dotL(F.col("qv"), F.col("cv")).cast("double").as("score"))
    explodeTopK(scored, k)
  }

  /** Per-dimension (min, max) training statistics of the SQ8 scalar
    * quantizer over the ×1000-quantized corpus — the "train" half of
    * faiss-style scalar quantization. dims-sized model rows collected
    * to the driver (bounded by the embedding width, never by the
    * corpus); one partial-aggregated posexplode scan.
    */
  private def sq8Stats(
      corpus: DataFrame, vecCol: String): (Seq[Long], Seq[Long]) = {
    val rows = corpus
      .select(F.posexplode(VectorFunctions.quantize(F.col(vecCol)))
        .as(Seq("dim", "x")))
      .groupBy("dim").agg(F.min("x").as("mn"), F.max("x").as("mx"))
      .orderBy("dim").collect()
    (rows.map(_.getLong(1)).toSeq, rows.map(_.getLong(2)).toSeq)
  }

  /** The SQ8 code transform against literal per-dim stats:
    * code_i = floor((x_i - mn_i) * 254 / (mx_i - mn_i)) onto the
    * [0, 254] grid (constant dims code 0). The double division is
    * EXACT as floor division here — numerator < 2^31 is
    * double-representable, and a BIGINT ratio can never land within
    * half-an-ulp of the wrong integer at these magnitudes — so the
    * oracle replays it bit-for-bit with the same FLOOR(x/y) shape.
    */
  private def sq8CodeCol(
      qv: Column, mns: Seq[Long], mxs: Seq[Long]): Column = {
    val mnL = F.typedlit(mns)
    val mxL = F.typedlit(mxs)
    F.transform(qv, (x, i) => {
      val mn = F.element_at(mnL, i + 1)
      val span = F.element_at(mxL, i + 1) - mn
      F.when(span === 0L, F.lit(0L))
        .otherwise(F.floor(((x - mn) * F.lit(254L)).cast("double") /
          span.cast("double")))
    })
  }

  /** SQ8 code table: (vec_id, code) with each dimension affinely
    * mapped onto the 8-bit [0, 254] grid by the corpus-trained
    * per-dim (min, max) — the faiss ScalarQuantizer layout. The
    * serving scan reads 1 byte per dim instead of 4 (grading keeps
    * longs; the information content is the byte grid).
    */
  def sq8Codes(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (mns, mxs) = sq8Stats(corpus, vecCol)
    corpus.select(F.col(idCol).as("vec_id"),
      sq8CodeCol(VectorFunctions.quantize(F.col(vecCol)), mns, mxs).as("code"))
  }

  /** Scalar-quantized (SQ8) top-k: both sides code through the SAME
    * corpus-trained per-dim quantizer, and candidates rank by the
    * symmetric integer L2² between DECODED codes — each side
    * reconstructs x̂_i = mn_i + code_i·span_i/254 and the mn_i offsets
    * cancel in the difference, so the per-dim term is
    * (⌊qc_i·span_i/254⌋ − ⌊cc_i·span_i/254⌋)², a BIGINT, ascending,
    * ids ascending on ties. Decoding (rather than ranking raw code
    * units) keeps wide dims weighted more than narrow ones, exactly as
    * the faiss ScalarQuantizer's symmetric distance does. The third
    * compression family beside PQ/ADC ([[pqAdcTopK]]: codebook per
    * subspace) and the raw quantized dot ([[bruteForceTopKQuant]]):
    * per-dim affine onto a byte grid, no codebook beyond dim stats.
    *
    * Scale shape: train is one posexplode scan reducing to dims rows;
    * coding + decoding are map-only against literal stats (decode
    * happens per ROW before the join, never per pair); serving joins
    * the byte-grid code table against broadcast coded queries with the
    * bounded topk_pairs aggregate (k-element sketches per query cross
    * the shuffle, never the scored pairs).
    *
    * Magnitude contract: ranking passes the negated BIGINT L2² through
    * topk_pairs' double score, which is exact only below 2^53. With the
    * x1000 quantizer a dim contributes ≤(2·|x|·1000)² per term, so
    * unit-scale embeddings (|x|≤~30, dims≤~4096) stay far under the
    * bound — enforced by a require on the per-dim span below rather
    * than assumed.
    */
  def sq8TopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeSelf: Boolean = true,
      maxBroadcastQueries: Long = 100000L): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val (mns, mxs) = sq8Stats(corpus, vecCol)
    // worst-case L2² is Σ span_i²; it must sit below 2^53 so the
    // negated-distance double ranking stays exact (see Scaladoc)
    val worstL2 = mns.zip(mxs).map { case (a, b) => BigInt(b - a).pow(2) }.sum
    require(worstL2 <= (BigInt(1) << 53),
      s"sq8TopK: worst-case L2^2 $worstL2 exceeds 2^53; double ranking " +
        "would lose exactness — rescale the embeddings")
    val spanL = F.typedlit(mns.zip(mxs).map { case (a, b) => b - a })
    // decoded reconstruction per ROW (the mn offset cancels pairwise);
    // floor(x/254.0) is exact integer division at these magnitudes
    def coded(df: DataFrame, id: String) = df.select(F.col(idCol).as(id),
      F.transform(
        sq8CodeCol(VectorFunctions.quantize(F.col(vecCol)), mns, mxs),
        (c, i) => F.floor((c * F.element_at(spanL, i + 1)).cast("double") /
          F.lit(254.0))).as(s"${id}_c"))
    val c = coded(corpus, "neighbor_id")
    val q = coded(queries, "query_id")
    val dist = F.aggregate(
      F.zip_with(F.col("query_id_c"), F.col("neighbor_id_c"),
        (a, b) => (a - b) * (a - b)),
      F.lit(0L), (acc, v) => acc + v)
    val scored = c.join(broadcastIfSmall(q, maxBroadcastQueries))
      .filter(if (excludeSelf) F.col("query_id") =!= F.col("neighbor_id") else F.lit(true))
      // topk_pairs ranks score DESC with ids ascending on ties, so the
      // negated distance makes it a nearest-first ranking
      .select(F.col("query_id"), F.col("neighbor_id"),
        (-dist).cast("double").as("score"))
    explodeTopK(scored, k)
      .select(F.col("query_id"), F.col("neighbor_id"),
        (-F.col("score")).cast("long").as("dist"), F.col("rank"))
  }

  /** IVF recall-vs-nprobe curve — the "choose nprobe" serving
    * diagnostic: for each probe budget, how many of the exact top-k
    * pairs the IVF tier recovers (14/21/29/37 of 50 at nprobe 1/2/4/8
    * over the sf0.01 embeddings). Run once per index configuration to
    * buy the latency/recall trade with evidence instead of folklore;
    * the same role [[lshTopKMultiProbe]]'s probe budget plays on the
    * LSH side. Exact integers (quantized-dot metric, deterministic
    * tie-breaks), so the curve replays bit-for-bit.
    *
    * Scale shape: one brute-force pass over the bounded EVAL query set
    * establishes truth (|queries|·k rows — eval-set-sized, the one
    * materialization), then one [[ivfTopK]] pass per probe budget;
    * each reduces to a single (nprobe, n_truth, n_hits) row via a
    * semi-join on the truth set. |nprobes| bounded passes, never an
    * all-pairs product over the corpus.
    */
  def ivfRecallCurve(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobes: Seq[Int] = Seq(1, 2, 4, 8),
      nlist: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(_ >= 1), "nprobes >= 1")
    val truth = bruteForceTopKQuant(corpus, queries, k, idCol, vecCol)
      .select(F.col("query_id"), F.col("neighbor_id"))
      .localCheckpoint() // eval-set-sized; probed |nprobes| times + counted
    val nt = truth.agg(F.count(F.lit(1)).as("n_truth"))
    nprobes.map { np =>
      ivfTopK(corpus, queries, k, nlist = nlist, nprobe = np,
          idCol = idCol, vecCol = vecCol)
        .select("query_id", "neighbor_id")
        .join(truth, Seq("query_id", "neighbor_id"), "leftsemi")
        .agg(F.count(F.lit(1)).as("n_hits"))
        .select(F.lit(np.toLong).as("nprobe"), F.col("n_hits"))
        .crossJoin(nt) // 1-row scalar spine
        .select("nprobe", "n_truth", "n_hits")
    }.reduce(_.unionByName(_)).orderBy("nprobe")
  }

  /** Dimension-truncation recall curve — the "how many dims do I
    * actually need to store" diagnostic (the question Matryoshka-style
    * embeddings exist to answer): for each prefix width d, rank by the
    * quantized dot over the FIRST d dimensions only and count how many
    * exact full-width top-k pairs survive. A steep curve (3/6/15/50 of
    * 50 at d = 8/16/32/64 on the sf0.01 embeddings) is the honest
    * verdict that THESE vectors don't truncate — the query exists to
    * measure that before a storage decision, not to flatter it.
    *
    * Scale shape: mirrors [[ivfRecallCurve]] — one brute pass over the
    * bounded eval set establishes truth (the one materialization),
    * then one prefix-sliced pass per width, each reducing to a single
    * (dims, n_truth, n_hits) row via a semi-join on the truth set.
    */
  def dimRecallCurve(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      widths: Seq[Int] = Seq(8, 16, 32, 64),
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ >= 1), "widths >= 1")
    val truth = bruteForceTopKQuant(corpus, queries, k, idCol, vecCol)
      .select(F.col("query_id"), F.col("neighbor_id"))
      .localCheckpoint() // eval-set-sized; probed |widths| times + counted
    val nt = truth.agg(F.count(F.lit(1)).as("n_truth"))
    def prefix(df: DataFrame, d: Int) =
      df.select(F.col(idCol), F.slice(F.col(vecCol), 1, d).as(vecCol))
    widths.map { d =>
      bruteForceTopKQuant(prefix(corpus, d), prefix(queries, d), k,
          idCol, vecCol)
        .select("query_id", "neighbor_id")
        .join(truth, Seq("query_id", "neighbor_id"), "leftsemi")
        .agg(F.count(F.lit(1)).as("n_hits"))
        .select(F.lit(d.toLong).as("dims"), F.col("n_hits"))
        .crossJoin(nt) // 1-row scalar spine
        .select("dims", "n_truth", "n_hits")
    }.reduce(_.unionByName(_)).orderBy("dims")
  }

  /** Integer hyperplane component for (dimension, seed): the first 32
    * bits of md5("dim:seed") mapped to [-1000, 1000]. md5 is the one hash
    * every engine computes identically, so the planes — and therefore the
    * buckets — are reproducible in the DuckDB oracle with no stored
    * model. Integer components + quantized vectors make the projection an
    * exact BIGINT: no float summation order to disagree on.
    */
  private[graft] def md5PlaneComp(dim: Int, seed: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$dim:$seed".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2001L - 1000L
  }

  private def plane(dims: Int, seed: Int): Seq[Long] =
    (0 until dims).map(md5PlaneComp(_, seed))

  /** Sign-bit LSH bucket of a QUANTIZED vector under `bits` integer
    * hyperplanes (seeds seedBase..seedBase+bits-1). Plane literals are
    * inlined driver-side (they are a model, ~dims*bits longs); the
    * projection per bit is one codegen'd integer dot — map-only, exact.
    */
  def planeBucket(qv: Column, bits: Int, seedBase: Int, dims: Int = 64): Column =
    (0 until bits).map { b =>
      F.when(
        VectorFunctions.dotL(qv, F.typedlit(plane(dims, seedBase + b))) >= 0,
        F.lit(1L << b)).otherwise(F.lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN via hyperplane LSH: queries and corpus bucketed identically;
    * candidates come only from the query's bucket; ranking is by the
    * quantized dot metric (exact integers — see [[bruteForceTopKQuant]]).
    * Recall is tuned by `bits` (fewer bits -> bigger buckets -> higher
    * recall, more work). At scale the bucket id is the shuffle key.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      bits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      maxBroadcastQueries: Long = 100000L): DataFrame =
    lshTopKFromIndex(
      lshBucketTable(corpus, bits, idCol, vecCol, dims),
      queries, k, bits, idCol, vecCol, dims, maxBroadcastQueries)

  /** The corpus side of [[lshTopK]] as a PERSISTABLE index table:
    * (neighbor_id, quantized vector, bucket id). Build it once, write it
    * with [[graft.sources.Catalog]], and serve query batches from the
    * stored table — the ANN-service pattern where the corpus index is an
    * offline artifact and per-query work is bucketing + one keyed join.
    * Same role [[Dedup.bucketTableMd5]] plays for incremental dedup.
    * Everything in the table is integer-deterministic, so an index built
    * today scores identically after any rewrite/compaction.
    */
  def lshBucketTable(
      corpus: DataFrame,
      bits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      attrCols: Seq[String] = Nil): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    // attrCols travel with the index so attribute-filtered serving
    // (lshTopKFromIndex's predicate) can prune index rows in the scan
    // instead of joining attributes back per query batch
    corpus.select(F.col(idCol).as("neighbor_id") +:
        VectorFunctions.quantize(F.col(vecCol)).as("cv") +:
        attrCols.map(F.col): _*)
      .withColumn("bk", planeBucket(F.col("cv"), bits, 0, dims))
  }

  /** ANN over a prebuilt [[lshBucketTable]] (inline or read back from
    * storage): queries bucket themselves under the same planes and join
    * the index on the bucket key.
    *
    * `predicate` (over the index's carried attribute columns —
    * [[lshBucketTable]]'s `attrCols`) restricts CANDIDATES before the
    * bucket join, pushed down into the index scan (pinned in PlanSpec).
    * RECALL NOTE: buckets were built on the full corpus, so filtering
    * shrinks each bucket without re-bucketing — the more selective the
    * predicate, the fewer in-bucket candidates survive and the lower
    * the recall vs a filtered brute-force scan. For highly selective
    * predicates, build a dedicated index over the filtered corpus (or
    * use more/coarser tables); q_ann_filtered grades the operating
    * point on the synthetic embeddings.
    */
  def lshTopKFromIndex(
      index: DataFrame,
      queries: DataFrame,
      k: Int,
      bits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      maxBroadcastQueries: Long = 100000L,
      predicate: Option[Column] = None): DataFrame = {
    graft.GraftFunctions.register(index.sparkSession)
    val cands = predicate.fold(index)(index.filter)
    val q = queries.select(F.col(idCol).as("query_id"),
      VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .withColumn("bk", planeBucket(F.col("qv"), bits, 0, dims))
    val scored = cands.join(broadcastIfSmall(q, maxBroadcastQueries), Seq("bk"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.dotL(F.col("qv"), F.col("cv")).cast("double").as("score"))
    explodeTopK(scored, k)
  }

  /** MULTI-PROBE sign-bit LSH ANN — the recall lever that costs extra
    * probes instead of extra index copies: beside its own bucket, each
    * query probes the buckets reached by flipping its `probes`
    * LOWEST-CONFIDENCE planes (smallest |projection| — the signs most
    * likely to disagree for a true near neighbor; ties to the lower
    * seed). One index table serves any probe budget, vs
    * [[lshTopKMulti]]'s `tables` independent copies — the classic
    * index-size/query-cost trade (Lv et al.'s multi-probe idea on the
    * sign-bit family). All arithmetic integer-exact; probe buckets are
    * distinct by construction, so no candidate dedup is needed.
    *
    * Scale shape: identical to [[lshTopK]] with a (probes+1)-way
    * per-query bucket explosion on the broadcast side — the index is
    * still scanned once, the bucket id is still the join key.
    */
  def lshTopKMultiProbe(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      bits: Int = 8,
      probes: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      maxBroadcastQueries: Long = 100000L): DataFrame = {
    require(probes >= 0 && probes <= bits, "0 <= probes <= bits")
    graft.GraftFunctions.register(corpus.sparkSession)
    val index = lshBucketTable(corpus, bits, idCol, vecCol, dims)
    val qv = F.col("qv")
    val projs = F.array((0 until bits).map(s =>
      VectorFunctions.dotL(qv, F.typedlit(plane(dims, s)))): _*)
    // seeds ordered by (|projection|, seed): the flip candidates
    val flipSeeds = F.slice(
      F.transform(
        F.array_sort(F.zip_with(
          projs, F.sequence(F.lit(0), F.lit(bits - 1)),
          (p, s) => F.struct(F.abs(p).as("a"), s.as("s")))),
        x => x.getField("s")),
      1, probes)
    val probeBks = F.concat(
      F.array(F.col("bk")),
      F.transform(flipSeeds, s => F.col("bk").bitwiseXOR(
        F.call_function("shiftleft", F.lit(1L), s.cast("int")))))
    val q = queries
      .select(F.col(idCol).as("query_id"),
        VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .withColumn("bk", planeBucket(qv, bits, 0, dims))
      .select(F.col("query_id"), F.col("qv"), F.explode(probeBks).as("bk"))
    val scored = index.join(broadcastIfSmall(q, maxBroadcastQueries), Seq("bk"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.dotL(F.col("qv"), F.col("cv")).cast("double").as("score"))
    explodeTopK(scored, k)
  }

  /** Multi-table (OR-amplified) sign-bit LSH ANN — the recall lever a
    * single table lacks: `tables` independent tables of `bits` planes
    * each (table t uses plane seeds [t*bits, (t+1)*bits)); a corpus
    * vector is a candidate when it shares ANY table's bucket with the
    * query. Candidate probability 1-(1-p^bits)^tables vs p^bits for one
    * table — the standard amplification trade (Indyk-Motwani; the same
    * banding [[graft.operators.Dedup.embeddingNearDups]] uses for
    * near-dup pairs).
    *
    * Candidates are deduped as slim (query_id, neighbor_id) pairs, then
    * vectors are joined back for exact quantized-dot ranking — the wide
    * arrays never pass through the distinct. Like [[ivfTopK]], the
    * corpus is scanned twice (bucket pass + score join) rather than
    * cached: at 100 TB two pruned columnar scans beat materializing the
    * working set. At scale (tbl, bk) is the shuffle key; per-table
    * bucket sizes bound every reducer.
    */
  def lshTopKMulti(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      tables: Int = 8,
      bits: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      maxBroadcastQueries: Long = 100000L): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    // One count of the raw query input decides every broadcast below:
    // qB is exactly |q| * tables rows (posexplode of a fixed-length
    // array), so both thresholds reduce to the same comparison.
    val qSmall = queries.count() <= maxBroadcastQueries
    val c = corpus.select(F.col(idCol).as("neighbor_id"),
      VectorFunctions.quantize(F.col(vecCol)).as("cv"))
    val q = queries.select(F.col(idCol).as("query_id"),
      VectorFunctions.quantize(F.col(vecCol)).as("qv"))
    def withTables(df: DataFrame, vc: String) = df
      .select(F.col(df.columns.head), F.posexplode(F.array(
        (0 until tables).map(t => planeBucket(F.col(vc), bits, t * bits, dims)): _*))
        .as(Seq("tbl", "bk")))
    val qB = withTables(q, "qv")
    val cand = withTables(c, "cv")
      .join(broadcastIf(qB, qSmall), Seq("tbl", "bk"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = cand
      .join(c, Seq("neighbor_id"))
      .join(broadcastIf(q, qSmall), Seq("query_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.dotL(F.col("qv"), F.col("cv")).cast("double").as("score"))
    explodeTopK(scored, k)
  }

  /** IVF-style ANN: `nlist` centroids picked deterministically by
    * md5-hash order of the id (a reproducible pseudo-random sample —
    * ONE TakeOrdered pass over the corpus, no count/filter prescans),
    * corpus assigned to its best cell once, queries probe the `nprobe`
    * best cells. Scoring is the quantized dot metric throughout, so the
    * whole operator — centroid choice, assignment, probing, ranking — is
    * integer-exact and replicated by the DuckDB oracle.
    *
    * The centroid table is collected to the driver (it is a MODEL — nlist
    * vectors, like k-means centers) and inlined as a literal, so corpus
    * assignment is a map-only pass with zero shuffle: per row, `nlist`
    * codegen'd integer dots and an inline argmax (ties to the lowest cell
    * index). The only shuffle in the whole operator is the cell-id probe
    * join, which carries candidate rows, not the corpus.
    */
  /** Deterministic one-pass centroid sample: the `nlist` QUANTIZED
    * vectors whose ids hash lowest under md5 (hex order, ties by id).
    * ONE TakeOrdered pass over the corpus — no count/filter prescans —
    * and fully oracle-replayable (ORDER BY md5(id) LIMIT nlist). The
    * k-means seeding rule shared by [[ivfTopK]] and [[kmeansStep]].
    */
  def sampleCentroids(
      corpus: DataFrame,
      nlist: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Long]] = {
    graft.GraftFunctions.register(corpus.sparkSession)
    corpus.select(F.col(idCol).as("id"),
      VectorFunctions.quantize(F.col(vecCol)).as("cv"))
      .orderBy(F.md5(F.col("id").cast("string").cast("binary")), F.col("id"))
      .limit(nlist)
      .select("cv")
      .collect()
      .map(_.getSeq[Long](0).toSeq)
      .toSeq
  }

  /** One distributed k-means (Lloyd) iteration over quantized vectors:
    * assign every corpus vector to its best (max integer dot) centroid —
    * ties to the lowest cell index, the same rule as [[ivfTopK]] — and
    * emit, per cell, the assignment count and the ELEMENT-WISE component
    * sums. Those are the exact sufficient statistics of the centroid
    * update (new centroid = sums / n); the division is left to the
    * caller so every engine-facing value stays an exact BIGINT.
    *
    * Scale shape: map-only assignment against broadcast centroid
    * literals (the model is nlist vectors), then ONE partial-aggregated
    * shuffle whose payload is O(cells × dims) longs regardless of corpus
    * size — the [[graft.functions.VectorSumL]] buffer does map-side
    * combine, so training IVF centroids on 100 TB costs scans, not
    * shuffles. Iterate by feeding `sums/n` back in as the next round's
    * centroids.
    */
  def kmeansStep(
      corpus: DataFrame,
      centroids: Seq[Seq[Long]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "kmeansStep needs at least one centroid")
    graft.GraftFunctions.register(corpus.sparkSession)
    val cents: Column = F.typedlit(centroids)
    // interpreted-HOF audit: the lambda references only the `cv`
    // ATTRIBUTE and the centroid literal — one dotL per centroid is the
    // intended evaluation count, nothing outer re-evaluates per element
    val cs = F.transform(cents, c => VectorFunctions.dotL(F.col("cv"), c))
    corpus.select(VectorFunctions.quantize(F.col(vecCol)).as("cv"))
      .withColumn("cs", cs)
      .withColumn("cell",
        (F.array_position(F.col("cs"), F.array_max(F.col("cs"))) - 1).cast("int"))
      .groupBy("cell")
      .agg(
        F.count(F.lit(1)).as("n_assigned"),
        graft.functions.VectorAgg.sumVecL(F.col("cv")).as("sums"))
  }

  /** Result of [[kmeansTrain]]: quantized centroids plus how the loop
    * ended. `centroids(j)` is cell j's component vector (exact BIGINTs in
    * the same floor(x*1000) plane as [[VectorFunctions.quantize]]).
    */
  final case class KmeansResult(
      centroids: Seq[Seq[Long]], iterations: Int, converged: Boolean)

  /** Full Lloyd training loop over [[kmeansStep]] — the composition that
    * turns the one-iteration primitive into an IVF-centroid trainer.
    *
    * Everything stays integer-exact so an unrolled SQL oracle can replay
    * the whole loop: seeds are the md5-order sample
    * ([[sampleCentroids]]), the centroid update is `floorDiv(sum_d, n)`
    * per component, and convergence is quantized-centroid fixed point
    * (next == current, bitwise) — no epsilon, no floating drift.
    *
    * Empty cells reseed from the SAME md5-ordered candidate pool at the
    * deterministic index `nlist * iter + cellIdx` (pool size
    * `nlist * (maxIters + 1)`, one disjoint reseed block per iteration,
    * so no cross-iteration counter is needed to replay it); a pool past
    * its end keeps the old centroid. A reseeding iteration never counts
    * as converged, even if the reseed happens to reproduce the previous
    * centroid.
    *
    * Scale shape: per iteration, ONE map-only assignment scan against
    * broadcast centroid literals and one partial-aggregated shuffle of
    * O(cells × dims) longs ([[kmeansStep]]); the driver touches only the
    * nlist-row sufficient statistics and the bounded candidate pool —
    * model-sized data, never the corpus.
    */
  def kmeansTrain(
      corpus: DataFrame,
      nlist: Int = 8,
      maxIters: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): KmeansResult = {
    require(nlist > 0 && maxIters > 0, "nlist and maxIters must be positive")
    val candidates = sampleCentroids(corpus, nlist * (maxIters + 1), idCol, vecCol)
    require(candidates.nonEmpty, "kmeansTrain needs a non-empty corpus")
    var cents: Seq[Seq[Long]] = candidates.take(nlist)
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      iter += 1
      val stats = kmeansStep(corpus, cents, idCol, vecCol)
        .select("cell", "n_assigned", "sums").collect()
      val byCell = stats.map(r =>
        r.getInt(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
      var reseeded = false
      val next: Seq[Seq[Long]] = cents.indices.map { j =>
        byCell.get(j) match {
          case Some((n, sums)) => sums.map(x => Math.floorDiv(x, n))
          case None =>
            val ci = nlist * iter + j
            if (ci < candidates.length) { reseeded = true; candidates(ci) }
            else cents(j)
        }
      }
      converged = !reseeded && next == cents
      cents = next
    }
    KmeansResult(cents, iter, converged)
  }

  /** `predicate` (over corpus columns) restricts CANDIDATES: it prunes
    * the corpus scan before cell assignment (pinned in PlanSpec), while
    * centroids still come from the UNFILTERED corpus — the cell geometry
    * is an index artifact that must not move per predicate, or cached
    * centroid models would be unusable for filtered serving. Probing is
    * unchanged, so recall vs a filtered brute force degrades with
    * selectivity exactly like [[lshTopKFromIndex]]'s (see its note).
    *
    * `querySizeHint` skips the count job that sizes the broadcast
    * decision when the caller already knows |queries| (e.g. a serving
    * layer with a fixed batch size).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastQueries: Long = 100000L,
      predicate: Option[Column] = None,
      querySizeHint: Option[Long] = None): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    // NOTE: the centroid pick below is a separate action, so the corpus
    // is scanned twice (pick + assignment). That is the scale-correct
    // trade: caching the quantized corpus would materialize the full
    // dataset to executor storage, which loses the moment the corpus
    // outgrows memory — two pruned columnar scans are cheaper at 100 TB.
    val c = predicate.fold(corpus)(corpus.filter)
      .select(F.col(idCol).as("neighbor_id"),
        VectorFunctions.quantize(F.col(vecCol)).as("cv"))
    val centRows = sampleCentroids(corpus, nlist, idCol, vecCol)
    val nc = centRows.length
    val cents: Column = F.typedlit(centRows)

    /** Integer scores of quantized `v` against every centroid.
      * Interpreted-HOF audit: callers pass `v` as an ATTRIBUTE (`cv`,
      * `qv`), so the lambda evaluates one dotL per centroid — the
      * intended count; no outer expression re-evaluates per element.
      */
    def cellScores(v: Column): Column =
      F.transform(cents, cent => VectorFunctions.dotL(v, cent))

    // Index of the best cell — first position of the max score (1-based
    // array_position makes the tie-break deterministic: lowest cell id).
    val assigned = c
      .withColumn("cs", cellScores(F.col("cv")))
      .withColumn("cell",
        (F.array_position(F.col("cs"), F.array_max(F.col("cs"))) - 1).cast("int"))
      .drop("cs")

    // Top-nprobe cells by score desc, ties to lower index: sort
    // struct(-score, idx) ascending, take the index field.
    val probes = queries
      .select(F.col(idCol).as("query_id"),
        VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .withColumn("cs", cellScores(F.col("qv")))
      .withColumn("cell", F.explode(F.slice(
        F.transform(
          F.array_sort(
            F.zip_with(F.col("cs"), F.sequence(F.lit(0), F.lit(nc - 1)),
              (s, i) => F.struct((-s).as("neg"), i.as("idx")))),
          x => x.getField("idx")),
        1, nprobe)))
      .drop("cs")

    // Each corpus vector lives in exactly one cell and a query's probe
    // cells are distinct, so a (query, neighbor) pair appears at most
    // once — no dedup needed. The broadcast decision counts the RAW
    // query input (probes is at most |queries| * nprobe rows); counting
    // the probes frame itself would evaluate the per-row centroid
    // scoring a second time just to decide a hint.
    val qSmall = querySizeHint.getOrElse(queries.count()) <= maxBroadcastQueries
    val scored = assigned
      .join(broadcastIf(probes, qSmall), Seq("cell"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.dotL(F.col("qv"), F.col("cv")).cast("double").as("score"))
    explodeTopK(scored, k)
  }

  /** Product-quantization code assignment — the compression half of
    * IVF-PQ: each quantized vector splits into `m` contiguous
    * subvectors, and each subvector is replaced by the index of its
    * nearest sub-centroid (exact integer L2², ties to the lowest
    * index). The codebook is deterministic: the first `ksub` md5-order
    * sampled vectors ([[sampleCentroids]]), each cut into its m
    * sub-centroids — so the oracle replays codebook, assignment, and
    * the total quantization error bit for bit.
    *
    * The argmin avoids materializing per-pair subtractions: over
    * integers, argmin_j |x−c_j|² = argmin_j (|c_j|² − 2·x·c_j), so each
    * candidate costs ONE codegen'd dotL against a literal sub-centroid
    * plus a precomputed constant; |x_s|² is added back once per
    * subspace to report the true quantization error.
    *
    * Scale shape: map-only — the codebook is m×ksub literals broadcast
    * in the plan, each row does m×ksub compiled dot products, and no
    * shuffle exists at all. Output is the m-byte-ish code table that at
    * 100 TB replaces the raw vectors for ADC scanning.
    */
  /** Per-subspace (code, error) column pairs over a quantized-vector
    * attribute `qv` — the shared argmin core of [[pqCodes]] and
    * [[ivfPqTopK]]'s corpus side. Codes via |c|²−2x·c against literal
    * sub-centroids; error adds |x_s|² back for the true L2².
    */
  private def pqCodeCols(
      samples: Seq[Seq[Long]], m: Int, dsub: Int): Seq[(Column, Column)] =
    (0 until m).map { sIdx =>
      def xs = F.slice(F.col("qv"), sIdx * dsub + 1, dsub)
      val scores = F.array(samples.indices.map { j =>
        val c = samples(j).slice(sIdx * dsub, (sIdx + 1) * dsub)
        val c2 = c.map(v => v * v).sum
        F.lit(c2) - F.lit(2L) * VectorFunctions.dotL(xs, F.typedlit(c))
      }: _*)
      val code = (F.array_position(scores, F.array_min(scores)) - 1)
        .cast("int").as(s"code_$sIdx")
      // true per-subspace L2^2: |x|^2 + min_j(|c_j|^2 - 2 x.c_j)
      val err = VectorFunctions.dotL(xs, xs) + F.array_min(scores)
      (code, err)
    }

  /** Per-subspace ADC lookup-table columns over a quantized-vector
    * attribute `qv`: lut_s[j] = |q_s − c_{s,j}|² as exact BIGINTs —
    * the query-side twin of [[pqCodeCols]], shared by [[pqAdcTopK]]
    * and [[ivfPqTopK]] so the formula the oracles replay bit-for-bit
    * lives in exactly one place.
    */
  private def pqLutCols(
      samples: Seq[Seq[Long]], m: Int, dsub: Int): Seq[Column] =
    (0 until m).map { sIdx =>
      def qs = F.slice(F.col("qv"), sIdx * dsub + 1, dsub)
      F.array(samples.indices.map { j =>
        val c = samples(j).slice(sIdx * dsub, (sIdx + 1) * dsub)
        val c2 = c.map(v => v * v).sum
        // |q_s|^2 + |c_j|^2 - 2 q_s.c_j = |q_s - c_j|^2, all BIGINT
        VectorFunctions.dotL(qs, qs) + F.lit(c2) -
          F.lit(2L) * VectorFunctions.dotL(qs, F.typedlit(c))
      }: _*).as(s"lut_$sIdx")
    }

  def pqCodes(
      corpus: DataFrame,
      m: Int = 4,
      ksub: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val samples = sampleCentroids(corpus, ksub, idCol, vecCol)
    require(samples.nonEmpty, "pqCodes needs a non-empty corpus")
    val dims = samples.head.length
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val dsub = dims / m
    val base = corpus.select(F.col(idCol),
      VectorFunctions.quantize(F.col(vecCol)).as("qv"))
    val perSub = pqCodeCols(samples, m, dsub)
    base.select(
      (F.col(idCol) +: perSub.map(_._1)) :+
        perSub.map(_._2).reduce(_ + _).as("qerr"): _*)
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes — the
    * serving half of IVF-PQ: each query precomputes its m×ksub lookup
    * table of exact sub-distances |q_s − c_{s,j}|² against the literal
    * codebook, and every corpus vector is then scored by m array
    * lookups on its CODES — the raw vectors never participate. Exact
    * integer arithmetic end to end, so the oracle replays LUTs, lookup
    * sums, and ranking bit for bit.
    *
    * Scale shape: THE reason PQ exists — the scan side reads an
    * m-int16-ish code table instead of the full vectors (a 64-to-1-ish
    * byte reduction at dims=64/m=4), queries broadcast with their LUTs
    * attached, scoring is map-only, and the bounded topk_pairs
    * aggregate keeps the shuffle at k-element sketches per query. Rank
    * quality trades against [[bruteForceTopKQuant]] exactly as PQ
    * promises; compose with [[ivfTopK]]'s cells to prune the scan too.
    */
  def pqAdcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int = 4,
      ksub: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastQueries: Long = 100000L,
      querySizeHint: Option[Long] = None): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    // ONE sampling action serves both the code assignment and the LUTs
    // (calling pqCodes here would re-run the identical deterministic
    // sample — a second full corpus scan for bytes-equal centroids)
    val samples = sampleCentroids(corpus, ksub, idCol, vecCol)
    require(samples.nonEmpty, "pqAdcTopK needs a non-empty corpus")
    val dims = samples.head.length
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val dsub = dims / m
    val codes = corpus
      .select(F.col(idCol).as("neighbor_id"),
        VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .select(F.col("neighbor_id") +: pqCodeCols(samples, m, dsub).map(_._1): _*)
    val withLuts = queries
      .select(F.col(idCol).as("query_id"),
        VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .select(F.col("query_id") +: pqLutCols(samples, m, dsub): _*)
    val qSmall = querySizeHint.getOrElse(queries.count()) <= maxBroadcastQueries
    val dist = (0 until m)
      .map(s => F.element_at(F.col(s"lut_$s"), F.col(s"code_$s") + 1))
      .reduce(_ + _)
    val scored = codes
      .crossJoin(broadcastIf(withLuts, qSmall))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      // topk_pairs ranks score DESC with ids ascending on ties, so the
      // negated distance makes it a nearest-first ranking
      .select(F.col("query_id"), F.col("neighbor_id"),
        (-dist).cast("double").as("score"))
    explodeTopK(scored, k)
      .select(F.col("query_id"), F.col("neighbor_id"),
        (-F.col("score")).cast("long").as("adc_dist"),
        F.col("rank"))
  }

  /** The full IVF-PQ composition: coarse cells prune WHICH vectors are
    * scanned ([[ivfTopK]]'s assignment/probe rule), PQ codes compress
    * WHAT is scanned ([[pqAdcTopK]]'s LUT lookups) — one corpus scan
    * computes both the cell and the codes, so the serving table is
    * (id, cell, m codes) and the raw vectors appear in no join at all.
    * The PQ codebook is the md5-order sample PREFIX of the cell
    * centroids (same ordered pool), keeping the whole model replayable.
    *
    * Scale shape: the 100 TB ANN layout verbatim — broadcast queries
    * carry their integer LUTs into the probed cells only (the cell join
    * replaces pqAdcTopK's full-scan cross join), scoring is m array
    * lookups per candidate, and the bounded topk_pairs aggregate
    * shuffles k-element sketches per query.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 4,
      ksub: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastQueries: Long = 100000L,
      querySizeHint: Option[Long] = None): DataFrame = {
    val pool = sampleCentroids(corpus, math.max(nlist, ksub), idCol, vecCol)
    require(pool.nonEmpty, "ivfPqTopK needs a non-empty corpus")
    ivfPqServe(pool, ivfPqCodeTable(corpus, pool, nlist, m, ksub, idCol, vecCol),
      queries, k, nlist, nprobe, m, ksub, idCol, vecCol,
      maxBroadcastQueries, querySizeHint)
  }

  /** Offline half of the PERSISTED IVF-PQ split: one corpus scan
    * produces the two index tables a serving layer writes to storage —
    * `model` (cid, centroid): the md5-order centroid pool, max(nlist,
    *   ksub) quantized rows; prefix nlist = coarse cells, prefix ksub =
    *   PQ codebook (the same shared-pool rule as [[ivfPqTopK]]).
    * `codes` (neighbor_id, cell, code_0..code_{m-1}): the serving
    *   table — m small ints per corpus vector, raw vectors nowhere.
    * Parquet-persist both; [[ivfPqTopKFromIndex]] serves from them
    * without touching the original corpus, and because model + codes
    * fully determine the scores, index-served results equal
    * [[ivfPqTopK]] on the same corpus bit for bit.
    */
  def ivfPqIndex(
      corpus: DataFrame,
      nlist: Int = 16,
      m: Int = 4,
      ksub: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val pool = sampleCentroids(corpus, math.max(nlist, ksub), idCol, vecCol)
    require(pool.nonEmpty, "ivfPqIndex needs a non-empty corpus")
    val session = corpus.sparkSession
    import session.implicits._
    val model = pool.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cid", "centroid")
    (model, ivfPqCodeTable(corpus, pool, nlist, m, ksub, idCol, vecCol))
  }

  /** Online half of the persisted IVF-PQ split: answer `queries` from
    * the two index tables of [[ivfPqIndex]] — the ANN serving shape
    * where the corpus appears ONLY through its code table. The model is
    * collected to the driver (max(nlist, ksub) rows — model-sized by
    * construction, never corpus-sized) to rebuild the literal centroid
    * expressions, then serving is identical to [[ivfPqTopK]]'s query
    * side: broadcast queries carry integer LUTs into probed cells,
    * scoring is m array lookups per candidate, one bounded top-k
    * shuffle.
    */
  /** Decode a persisted model table back to the centroid pool — the ONE
    * place that knows the (cid-ordered, centroid-at-ordinal-1) layout;
    * shared by from-index serving and streaming index maintenance.
    */
  private[graft] def collectPool(model: DataFrame): Seq[Seq[Long]] =
    model.orderBy("cid").collect().map(_.getSeq[Long](1).toSeq).toSeq

  /** Drift-triggered IVF re-balance — the auto-knob contract
    * ([[graft.operators.Dedup.autoBandBits]], [[graft.operators.Skew.autoSalts]])
    * applied to the index MODEL: a streaming IVF-PQ index codes new
    * vectors against a frozen centroid pool, so under distribution
    * drift the coarse cells skew (q_ivf_balance is the detector) and
    * every probe of the hot cell scans a growing fraction of the
    * corpus. This op closes the loop: measure the occupancy skew of the
    * CURRENT codes table, and when the hottest cell exceeds
    * `maxCellMilli`/1000 × the balanced share (milli-exact integer
    * compare — an independent engine reproduces the decision
    * bit-for-bit), rebuild the index on the current corpus with the
    * SAME deterministic pool rule a fresh build uses — so a rebalanced
    * index is INDISTINGUISHABLE from a fresh build (the graded
    * equivalence; a kmeans-refined pool can slot in where replayability
    * matters less than quality). Below threshold, model and codes pass
    * through untouched: re-coding a 10B-vector corpus is the expensive
    * arm, and the measured trigger is what keeps it rare.
    *
    * Scale shape: the decision reads one (max, total) row off a
    * |cells|-sized partial aggregate; the rebuild arm is one corpus
    * scan (the [[ivfPqIndex]] build) — and only runs when the measured
    * skew says the serving cost already exceeds it.
    *
    * What the rebuild buys (and doesn't): the refreshed pool REPRESENTS
    * the drifted region — ADC distances for drifted queries are no
    * longer measured against wrong-region centroids. It does NOT
    * promise flat cells: under the quantized-dot cell metric a
    * genuinely dense drifted cluster occupies one cell regardless of
    * the pool (OperatorsSpec pins exactly this distinction).
    */
  def ivfRebalanceIfSkewed(
      corpus: DataFrame,
      model: DataFrame,
      codes: DataFrame,
      nlist: Int = 16,
      m: Int = 4,
      ksub: Int = 8,
      maxCellMilli: Long = 4000L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, DataFrame, Boolean) = {
    // materialize the codes ONCE (they are the serving table itself —
    // m small ints per vector): the decision aggregate and whatever the
    // caller does next both read the copy, instead of each re-running
    // the coding pipeline the `codes` plan may carry
    val c = codes.localCheckpoint()
    val row = c.groupBy("cell").agg(F.count(F.lit(1)).as("c"))
      .agg(F.coalesce(F.max("c"), F.lit(0L)).as("mx"),
        F.coalesce(F.sum("c"), F.lit(0L)).as("tot"))
      .head()
    val (mx, tot) = (row.getLong(0), row.getLong(1))
    if (tot == 0L || mx * nlist * 1000L <= maxCellMilli * tot)
      (model, c, false)
    else {
      val (m2, c2) = ivfPqIndex(corpus, nlist, m, ksub, idCol, vecCol)
      (m2, c2, true)
    }
  }

  def ivfPqTopKFromIndex(
      model: DataFrame,
      codes: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 4,
      ksub: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastQueries: Long = 100000L,
      querySizeHint: Option[Long] = None): DataFrame = {
    val pool = collectPool(model)
    require(pool.nonEmpty, "ivfPqTopKFromIndex needs a non-empty model")
    ivfPqServe(pool, codes, queries, k, nlist, nprobe, m, ksub,
      idCol, vecCol, maxBroadcastQueries, querySizeHint)
  }

  /** Corpus → (neighbor_id, cell, code_0..code_{m-1}) against a given
    * centroid pool — the single corpus scan shared by [[ivfPqTopK]]
    * (inline) and [[ivfPqIndex]] (persisted).
    */
  private[graft] def ivfPqCodeTable(
      corpus: DataFrame,
      pool: Seq[Seq[Long]],
      nlist: Int,
      m: Int,
      ksub: Int,
      idCol: String,
      vecCol: String): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val centRows = pool.take(nlist)
    val samples = pool.take(ksub)
    val dims = samples.head.length
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val dsub = dims / m
    val cents: Column = F.typedlit(centRows)
    // interpreted-HOF audit: lambdas read the qv ATTRIBUTE + centroid
    // literals — one dotL per centroid, the intended count
    def cellScores = F.transform(cents, c => VectorFunctions.dotL(F.col("qv"), c))
    val perSub = pqCodeCols(samples, m, dsub)
    corpus
      .select(F.col(idCol).as("neighbor_id"),
        VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .withColumn("cs", cellScores)
      .withColumn("cell",
        (F.array_position(F.col("cs"), F.array_max(F.col("cs"))) - 1).cast("int"))
      .select(F.col("neighbor_id") +: F.col("cell") +: perSub.map(_._1): _*)
  }

  /** Query side shared by [[ivfPqTopK]] and [[ivfPqTopKFromIndex]]:
    * probe-cell explosion, LUT construction, code-lookup ADC scoring,
    * bounded top-k.
    */
  private def ivfPqServe(
      pool: Seq[Seq[Long]],
      corpusCodes: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int,
      nprobe: Int,
      m: Int,
      ksub: Int,
      idCol: String,
      vecCol: String,
      maxBroadcastQueries: Long,
      querySizeHint: Option[Long]): DataFrame = {
    graft.GraftFunctions.register(queries.sparkSession)
    val centRows = pool.take(nlist)
    val samples = pool.take(ksub)
    val dims = samples.head.length
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val dsub = dims / m
    val nc = centRows.length
    val cents: Column = F.typedlit(centRows)
    def cellScores = F.transform(cents, c => VectorFunctions.dotL(F.col("qv"), c))
    val withLuts = queries
      .select(F.col(idCol).as("query_id"),
        VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .withColumn("cs", cellScores)
      .withColumn("cell", F.explode(F.slice(
        F.transform(
          F.array_sort(
            F.zip_with(F.col("cs"), F.sequence(F.lit(0), F.lit(nc - 1)),
              (s, i) => F.struct((-s).as("neg"), i.as("idx")))),
          x => x.getField("idx")),
        1, nprobe)))
      .select(F.col("query_id") +: F.col("cell") +: pqLutCols(samples, m, dsub): _*)
    val qSmall = querySizeHint.getOrElse(queries.count()) <= maxBroadcastQueries
    val dist = (0 until m)
      .map(s => F.element_at(F.col(s"lut_$s"), F.col(s"code_$s") + 1))
      .reduce(_ + _)
    val scored = corpusCodes
      .join(broadcastIf(withLuts, qSmall), Seq("cell"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        (-dist).cast("double").as("score"))
    explodeTopK(scored, k)
      .select(F.col("query_id"), F.col("neighbor_id"),
        (-F.col("score")).cast("long").as("adc_dist"),
        F.col("rank"))
  }

  /** Write an LSH bucket index PARTITIONED by the bucket's high bits —
    * the storage layout that makes serving reads partition-pruned: a
    * query batch touches only the directories whose `bk_hi` matches
    * one of its own buckets, so probe I/O scales with the batch's
    * bucket footprint (≤ min(2^hiBits, |batch|) partitions), not the
    * index size. hiBits bounds the directory fan-out (2^hiBits
    * partitions); the low bits stay in the row for the exact bucket
    * equi-join.
    */
  def writePartitionedIndex(
      index: DataFrame,
      path: String,
      bits: Int = 8,
      hiBits: Int = 4): Unit = {
    require(hiBits >= 1 && hiBits <= bits, "1 <= hiBits <= bits")
    index.withColumn("bk_hi", F.shiftright(F.col("bk"), bits - hiBits))
      .write.partitionBy("bk_hi").mode("overwrite").parquet(path)
  }

  /** Serve ANN from a [[writePartitionedIndex]] layout: the query
    * batch's distinct high-bit buckets are collected (bounded by
    * 2^hiBits — driver-safe by construction) and pushed as a PARTITION
    * filter, so the scan reads only matching directories (pinned in
    * PlanSpec); candidates then join on the exact bucket as in
    * [[lshTopKFromIndex]]. Bucket pruning cannot drop candidates: an
    * exact-bk match implies an equal bk_hi. Results are identical to
    * the unpartitioned path.
    */
  def lshTopKFromPartitionedIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      bits: Int = 8,
      hiBits: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      maxBroadcastQueries: Long = 100000L): DataFrame = {
    graft.GraftFunctions.register(spark)
    val q = queries.select(F.col(idCol).as("query_id"),
      VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .withColumn("bk", planeBucket(F.col("qv"), bits, 0, dims))
      .withColumn("bk_hi", F.shiftright(F.col("bk"), bits - hiBits))
    val hits = q.select("bk_hi").distinct().collect().map(_.getLong(0))
    val cands = spark.read.parquet(path)
      .filter(F.col("bk_hi").isin(hits.toIndexedSeq: _*))
    val scored = cands
      .join(broadcastIfSmall(q.drop("bk_hi"), maxBroadcastQueries), Seq("bk"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.dotL(F.col("qv"), F.col("cv")).cast("double").as("score"))
    explodeTopK(scored, k)
  }

  /** kNN label prediction — the standard embedding-quality eval: each
    * query's label is predicted by the MAJORITY label of its k nearest
    * neighbors under the exact quantized-dot metric
    * ([[bruteForceTopKQuant]]); vote ties break to the smallest label,
    * so prediction is deterministic and the oracle replays it exactly.
    * Output: (query_id, true_label, pred_label, votes) — aggregate for
    * accuracy, inspect rows for the confusion structure.
    *
    * Scale shape: the neighbor search dominates and inherits its tier's
    * shape (swap in an LSH/IVF top-k for the brute-force call to serve
    * at corpus scale); after it, everything is bounded — k rows per
    * query through a slim label join on neighbor id, one per-query
    * argmax window over at most k vote rows.
    */
  def knnClassify(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      labelCol: String = "label",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastQueries: Long = 100000L): DataFrame = {
    val topk = bruteForceTopKQuant(corpus, queries, k, idCol, vecCol,
      excludeSelf = true, maxBroadcastQueries = maxBroadcastQueries)
    val labels = corpus.select(F.col(idCol).as("neighbor_id"),
      F.col(labelCol).as("neighbor_label"))
    val votes = topk.join(labels, Seq("neighbor_id"))
      .groupBy("query_id", "neighbor_label")
      .agg(F.count(F.lit(1)).as("votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("votes").desc, F.col("neighbor_label").asc)
    votes.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") === 1)
      .join(queries.select(F.col(idCol).as("query_id"),
        F.col(labelCol).as("true_label")), Seq("query_id"))
      .select(F.col("query_id"), F.col("true_label"),
        F.col("neighbor_label").as("pred_label"), F.col("votes"))
  }

  /** Hard-negative mining — contrastive-training data generation: for
    * each query, the k NEAREST corpus vectors carrying a DIFFERENT
    * label (the confusable impostors a contrastive loss needs), ranked
    * by the exact quantized-dot metric with ascending-id tie-break.
    * Output: (query_id, neighbor_id, neighbor_label, score, rank).
    *
    * Scale shape: identical to [[bruteForceTopKQuant]] — the label
    * inequality is one more predicate on the broadcast-join scan, and
    * the bounded top-k aggregate shuffles k-element sketches per
    * query; the neighbor-label lookup joins only the k-per-query
    * survivors. Swap the scan side for an LSH/IVF candidate tier to
    * serve at corpus scale.
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      labelCol: String = "label",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastQueries: Long = 100000L): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(F.col(idCol).as("query_id"),
      F.col(labelCol).as("query_label"),
      VectorFunctions.quantize(F.col(vecCol)).as("qv"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"),
      F.col(labelCol).as("neighbor_label"),
      VectorFunctions.quantize(F.col(vecCol)).as("cv"))
    val scored = c.join(broadcastIfSmall(q, maxBroadcastQueries))
      .filter(F.col("query_id") =!= F.col("neighbor_id") &&
        F.col("query_label") =!= F.col("neighbor_label"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        VectorFunctions.dotL(F.col("qv"), F.col("cv")).cast("double").as("score"))
    explodeTopK(scored, k)
      .join(corpus.select(F.col(idCol).as("neighbor_id"),
        F.col(labelCol).as("neighbor_label")), Seq("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        F.col("neighbor_label"), F.col("score"), F.col("rank"))
  }

  /** Greedy k-center coreset — DIVERSITY sampling for training data:
    * seed with the md5-order first vector (the [[sampleCentroids]]
    * convention), then repeatedly select the vector FARTHEST from the
    * current center set (max-min quantized L2², ties to the smallest
    * id) — the classical 2-approximation to the k-center cover, whose
    * selection radii are exactly the coverage guarantee. Exact
    * duplicates of chosen centers (distance 0) are never selected, so
    * the coreset is automatically dup-free. Output: (rank, vec_id,
    * sel_dist) with sel_dist the max-min distance AT selection —
    * non-increasing by construction, and the whole trace is graded.
    *
    * Scale shape: k full scans (the persisted quantized projection),
    * each a map-side distance against ≤ k literal centers folded into
    * ONE TakeOrdered(1) — no shuffle wider than a single row; the
    * driver holds exactly the k selected (id, vector) pairs,
    * model-sized by construction. k is a model hyperparameter
    * (8-1024), not data-sized.
    */
  def kCenterGreedy(
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k >= 1")
    val session = corpus.sparkSession
    graft.GraftFunctions.register(session)
    val base = corpus.select(F.col(idCol).cast("long").as("vec_id"),
        VectorFunctions.quantize(F.col(vecCol)).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = base
        .orderBy(F.md5(F.col("vec_id").cast("string").cast("binary")), F.col("vec_id"))
        .limit(1).collect()
      require(seed.nonEmpty, "kCenterGreedy needs a non-empty corpus")
      var selected = Vector(
        (0L, seed.head.getLong(0), 0L, seed.head.getSeq[Long](1).toSeq))
      var i = 1
      var exhausted = false
      while (i < k && !exhausted) {
        val cents = F.typedlit(selected.map(_._4))
        val qv = F.col("qv")
        val dist = F.array_min(F.transform(cents, c =>
          VectorFunctions.dotL(qv, qv) - F.lit(2L) * VectorFunctions.dotL(qv, c) +
            VectorFunctions.dotL(c, c)))
        val far = base.select(F.col("vec_id"), qv, dist.as("d"))
          .filter(F.col("d") > 0)
          .orderBy(F.col("d").desc, F.col("vec_id").asc)
          .limit(1).collect()
        if (far.isEmpty) exhausted = true // fewer than k distinct vectors
        else {
          val r = far.head
          selected :+= ((i.toLong, r.getLong(0), r.getLong(2), r.getSeq[Long](1).toSeq))
          i += 1
        }
      }
      import session.implicits._
      selected.map { case (rank, id, d, _) => (rank, id, d) }
        .toDF("rank", "vec_id", "sel_dist")
    } finally base.unpersist()
  }

  /** Johnson-Lindenstrauss random-projection recall curve — how much
    * nearest-neighbor structure survives projecting the 64-dim
    * embeddings onto `widths` deterministic integer hyperplanes (the
    * same md5-derived planes the LSH tier buckets with, used here as a
    * dense sketch instead of sign bits): for each query, exact-L2
    * top-`k` truth on the quantized vectors vs L2 top-`k` in each
    * projected space, hits per width. The evidence panel behind "can I
    * ship 4× smaller vectors" — the JL cousin of [[dimRecallCurve]]'s
    * prefix truncation (projection mixes all dims, truncation keeps a
    * prefix).
    *
    * All integer: projections are codegen dot products against plane
    * literals (|proj| ≤ 64·1000·1000), distances stay under 2^62, so
    * the oracle replays planes, projections and both rankings exactly.
    *
    * Scale shape: projection is map-only against broadcast plane
    * literals; each ranking is the broadcast-queries × corpus scan with
    * a per-query bounded top-k — the [[bruteForceTopK]] shape, once per
    * width, each reduced to a hits row by a semi-join. The eval set is
    * bounded; the corpus is never joined to itself.
    */
  def rpRecallCurve(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      widths: Seq[Int] = Seq(8, 16),
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(widths.nonEmpty && widths.forall(w => w >= 1 && w <= 32), "widths in [1,32]")
    val session = corpus.sparkSession
    graft.GraftFunctions.register(session)
    def quant(df: DataFrame, as: String) = df.select(
      F.col(idCol).cast("long").as(as),
      VectorFunctions.quantize(F.col(vecCol)).as(s"__v_$as"))
    val c = quant(corpus, "neighbor_id")
    val q = broadcastIfSmall(quant(queries, "query_id"), 100000L)
    // exact-L2 top-k on a (query, candidate) pair stream, ties to id
    def topkByL2(pairs: DataFrame, dist: Column): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(dist.asc, F.col("neighbor_id").asc)
      pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id")
    }
    val joined = q.join(c, F.col("query_id") =!= F.col("neighbor_id"))
    def l2(a: Column, b: Column): Column =
      VectorFunctions.dotL(a, a) - F.lit(2L) * VectorFunctions.dotL(a, b) +
        VectorFunctions.dotL(b, b)
    val truth = topkByL2(joined, l2(F.col("__v_query_id"), F.col("__v_neighbor_id")))
    val hitCols = widths.map { wd =>
      val planesLit = (0 until wd).map(sd => F.typedlit(plane(64, sd)))
      def projArr(v: Column): Column =
        F.array(planesLit.map(p => VectorFunctions.dotL(v, p)): _*)
      val projected = joined
        .withColumn("__pq", projArr(F.col("__v_query_id")))
        .withColumn("__pc", projArr(F.col("__v_neighbor_id")))
      val d2 = F.aggregate(
        F.zip_with(F.col("__pq"), F.col("__pc"), (x, y) => (x - y) * (x - y)),
        F.lit(0L), (acc, v) => acc + v)
      val rp = topkByL2(projected, d2)
      truth.join(rp, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(F.count(F.lit(1)).as(s"hits_p$wd"))
    }
    hitCols.foldLeft(q.select(F.col("query_id"))) { (acc, h) =>
      acc.join(h, Seq("query_id"), "left")
    }.select(F.col("query_id") +: widths.map(wd =>
      F.coalesce(F.col(s"hits_p$wd"), F.lit(0L)).as(s"hits_p$wd")): _*)
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein '98)
    * — diversify a retrieval result so the top-k aren't k copies of the
    * same best match: greedily pick the candidate maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s)`. Fixed λ = 1/2, so the
    * per-pick objective scales to the exact integer
    * `mmr2 = rel − maxsim` on quantized dot products — deterministic,
    * tie-broken by id, oracle-replayable with no floats anywhere.
    *
    * Two tiers, deliberately split: the DISTRIBUTED tier computes
    * relevance against the query in one corpus scan (query vector
    * broadcast as a literal) and takes the top-`poolSize` candidate
    * pool via TakeOrderedAndProject; the DRIVER tier runs the
    * inherently sequential greedy loop over that pool — bounded at
    * `poolSize` rows × dim longs regardless of corpus size (the same
    * model-sized-only contract as [[kCenterGreedy]]'s per-round
    * collect). k·poolSize·dim driver multiplies ≈ 32k ops at the
    * defaults; the corpus never leaves the executors.
    *
    * Output: (rank, vec_id, rel, mmr2); rank 0 is the pure-relevance
    * argmax with mmr2 = rel (empty selected set ⇒ no penalty term).
    */
  def mmrRerank(
      corpus: DataFrame,
      queryId: Long,
      poolSize: Int = 50,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && poolSize >= k, "need poolSize >= k >= 1")
    val session = corpus.sparkSession
    graft.GraftFunctions.register(session)
    val base = corpus.select(F.col(idCol).cast("long").as("vec_id"),
      VectorFunctions.quantize(F.col(vecCol)).as("qv"))
    val qRow = base.filter(F.col("vec_id") === queryId).limit(1).collect()
    require(qRow.nonEmpty, s"mmrRerank: query vector $queryId not found")
    val qvLit = F.typedlit(qRow.head.getSeq[Long](1).toSeq)
    val pool = base.filter(F.col("vec_id") =!= queryId)
      .select(F.col("vec_id"), F.col("qv"),
        VectorFunctions.dotL(F.col("qv"), qvLit).as("rel"))
      .orderBy(F.col("rel").desc, F.col("vec_id").asc)
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // greedy with incremental max-sim: after each pick, fold the new
    // member into every remaining candidate's penalty — O(k·pool·dim)
    val maxSim = scala.collection.mutable.Map.empty[Long, Long]
    var remaining = pool.toVector
    var selected = Vector.empty[(Long, Long, Long, Long)]
    for (rank <- 0 until math.min(k, pool.length)) {
      val pick =
        if (rank == 0) remaining.minBy { case (id, _, rel) => (-rel, id) }
        else remaining.minBy { case (id, _, rel) => (-(rel - maxSim(id)), id) }
      val (pid, pqv, prel) = pick
      val mmr2 = if (rank == 0) prel else prel - maxSim(pid)
      selected :+= ((rank.toLong, pid, prel, mmr2))
      remaining = remaining.filterNot(_._1 == pid)
      remaining.foreach { case (id, cqv, _) =>
        val s = dot(cqv, pqv)
        maxSim.get(id) match {
          case Some(m) if m >= s => ()
          case _ => maxSim(id) = s
        }
      }
    }
    import session.implicits._
    selected.toDF("rank", "vec_id", "rel", "mmr2")
  }
}
