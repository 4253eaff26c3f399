package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.functions.TextFunctions

/** Retrieval primitives over a tokenized corpus: an inverted index
  * (bounded posting lists) and a BM25-family relevance scorer — the
  * "find the training documents about X" tools every corpus curation
  * loop ends up needing (inspecting contamination hits, pulling topical
  * slices, spot-checking dedup clusters).
  *
  * Everything is integer-derived or fixed-shape IEEE double arithmetic,
  * so the DuckDB oracle replays scores bit-for-bit. The reference has no
  * retrieval surface (SURVEY §2.9); these are training-data extensions.
  */
object Retrieval {

  /** Inverted index: one row per term with its exact document frequency
    * and a bounded posting list (the `maxPostings` smallest doc ids).
    *
    * Scale shape: terms are deduped per document map-side
    * (array_distinct before the explode), and the posting list is the
    * bounded min-k aggregate — every map task reduces its slice to at
    * most k ids per term BEFORE the shuffle, so a stopword's posting
    * list costs O(k) per partition, never a vocabulary-sized reducer.
    * df stays exact (count is unbounded-safe).
    */
  def invertedIndex(
      docs: DataFrame,
      maxPostings: Int = 100,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val toks = TextFunctions.tokens(F.lower(F.col(textCol)))
    docs
      .select(F.col(idCol).cast("long").as("id"),
        F.explode(F.array_distinct(toks)).as("term"))
      .groupBy("term")
      .agg(
        F.count(F.lit(1)).as("df"),
        graft.functions.TopK.minKIds(F.col("id"), maxPostings).as("postings"))
  }

  /** One BPE pair-counting step — the core primitive of tokenizer
    * training at corpus scale: the weighted count of every adjacent
    * character pair, tallied over the DISTINCT word vocabulary with
    * multiplicities rather than over the corpus. That ordering of
    * operations is the scale lever: the corpus reduces to (word, count)
    * through one partial-aggregated shuffle, and the quadratic-ish pair
    * expansion runs over the vocab (thousands of rows) instead of the
    * corpus (billions). The top pair is the merge a BPE trainer would
    * apply next; iterating with a merged symbol table is the full
    * trainer loop.
    *
    * Interpreted-HOF audit: the pair lambda reads ELEMENTS of the
    * materialized char-array attribute (two element_at + one concat per
    * adjacent position) — the intended evaluation count.
    */
  def bpePairCounts(
      docs: DataFrame,
      topK: Int = 10,
      textCol: String = "text"): DataFrame = {
    val toks = TextFunctions.tokens(F.lower(F.col(textCol)))
    val words = docs
      .select(F.explode(toks).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("n"))
    words
      .select(F.col("n"), F.split(F.col("w"), "").as("cs"))
      .select(F.col("n"), F.explode(
        // guard single-char/empty words: sequence(1, 0) DESCENDS in
        // Spark (default step -1) rather than being empty
        F.when(F.size(F.col("cs")) >= 2,
          F.transform(
            F.sequence(F.lit(1), F.size(F.col("cs")) - 1),
            i => F.concat(
              F.element_at(F.col("cs"), i), F.lit(" "),
              F.element_at(F.col("cs"), i + 1))))
          .otherwise(F.array().cast("array<string>"))).as("pair"))
      .groupBy("pair")
      .agg(F.sum(F.col("n")).as("cnt"))
      .orderBy(F.col("cnt").desc, F.col("pair"))
      .limit(topK)
  }

  /** Top-k documents for a bag-of-terms query under a BM25-family score
    * with a RATIO idf instead of the usual log:
    *
    *   idf(t)  = (N - df_t + 0.5) / (df_t + 0.5)
    *   s(t, d) = idf(t) * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * (dl / avgdl)))
    *   score   = s(t1, d) + s(t2, d) + …   (FIXED term order)
    *
    * Dropping the log keeps every step a fixed-shape IEEE double
    * expression over exact integers (tf, df, dl, N), which another
    * engine replays bit-identically — `log`'s rounding is libm-specific
    * and would poison a hash-compare. The ranking it induces is the
    * same family (idf_ratio is monotone in the classic idf).
    *
    * Determinism details, both load-bearing:
    *  - per-term tf is computed map-side (size of a filtered token
    *    array) and the score sums the terms in the CALLER'S order in one
    *    projection — no float aggregation whose partition order could
    *    reassociate the sum;
    *  - N, avgdl, df all come from ONE global partial-aggregated pass,
    *    broadcast back as a single-row cross join — no driver action.
    *
    * Scale shape: one corpus scan for the stats row, one for the scored
    * projection; candidates are docs containing ANY query term (the
    * filter is map-side); top-k compiles to TakeOrderedAndProject.
    */
  def bm25TopK(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    graft.GraftFunctions.register(docs.sparkSession)
    val toks = TextFunctions.tokens(F.lower(F.col(textCol)))
    // interpreted-HOF audit: each filter lambda compares ELEMENTS of the
    // materialized token attribute against a literal — one equality per
    // token per term is the intended evaluation count
    val base = docs
      .select(F.col(idCol).cast("long").as("doc_id"), toks.as("toks"))
      .select(F.col("doc_id") +: F.size(F.col("toks")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          F.size(F.filter(F.col("toks"), x => x === F.lit(t)))
            .cast("long").as(s"tf$i")
        }: _*)
    val statCols = F.count(F.lit(1)).as("n_docs") +:
      F.sum(F.col("dl")).as("total_dl") +:
      terms.indices.map(i =>
        F.sum((F.col(s"tf$i") > 0).cast("long")).as(s"df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    bm25Score(base, stats, terms.size, k1, b, k)
  }

  /** The shared BM25 scoring tail: `base` carries one row per document
    * as (doc_id, dl, tf0..tfN-1); `stats` is the one-row global frame
    * (n_docs, total_dl, df0..dfN-1). Factored out so the batch scorer
    * and the index-serving path ([[bm25FromIndex]]) evaluate the SAME
    * Column expression tree — bit-identical IEEE doubles by
    * construction, which is what lets one oracle grade both. */
  def bm25Score(
      base: DataFrame,
      stats: DataFrame,
      nTerms: Int,
      k1: Double,
      b: Double,
      k: Int): DataFrame = {
    val idx = 0 until nTerms
    val scored = base
      .filter(idx.map(i => F.col(s"tf$i") > 0).reduce(_ || _))
      .crossJoin(F.broadcast(stats))
    val n = F.col("n_docs")
    val avgdl = F.col("total_dl").cast("double") / n
    def s(i: Int) = {
      val tf = F.col(s"tf$i")
      val df = F.col(s"df$i")
      val idf = (n - df + F.lit(0.5)) / (df + F.lit(0.5))
      idf * (tf * F.lit(k1 + 1)) /
        (tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * (F.col("dl") / avgdl)))
    }
    scored
      .withColumn("score", idx.map(s).reduce(_ + _))
      .select(F.col("doc_id") +: F.col("dl") +:
        idx.map(i => F.col(s"tf$i")) :+ F.col("score"): _*)
      .orderBy(F.col("score").desc, F.col("doc_id"))
      .limit(k)
  }

  /** Flat postings for an incrementally-maintained inverted index: one
    * (term, doc_id, tf) row per distinct term per document, plus the
    * doc-length sidecar (doc_id, dl) needed by any tf-normalizing
    * scorer. Rows are sorted by term within each output partition so
    * parquet row-group min/max stats prune term-filtered serves.
    *
    * Scale shape: the explode is one shuffle onto (term, doc_id) with
    * map-side partial counts; nothing is driver-sized. Because a
    * document contributes all of its postings in the batch that carries
    * it, postings and dl rows are append-only across micro-batches —
    * index maintenance IS parquet append, no read-modify-write. */
  def postings(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val toks = TextFunctions.tokens(F.lower(F.col(textCol)))
    docs
      .select(F.col(idCol).cast("long").as("doc_id"), F.explode(toks).as("term"))
      .groupBy("term", "doc_id")
      .agg(F.count(F.lit(1)).as("tf"))
      .sortWithinPartitions("term")
  }

  /** [[postings]] with the document length riding INLINE on every row
    * (term, doc_id, tf, dl) — the impact-ordered-index trick: a
    * tf-normalizing scorer served from these postings never has to join
    * a corpus-sized doc-length sidecar, so the serve's data access is
    * term-pruned postings plus model-sized stats and nothing else. Costs
    * 8 bytes per posting row; buys a serve with zero corpus-sized scans.
    */
  def postingsWithDl(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val toks = TextFunctions.tokens(F.lower(F.col(textCol)))
    docs
      .select(F.col(idCol).cast("long").as("doc_id"), toks.as("toks"))
      .select(F.col("doc_id"),
        F.size(F.col("toks")).cast("long").as("dl"),
        F.explode(F.col("toks")).as("term"))
      // dl is constant per doc_id; max() is the associative way to carry
      // it through the (term, doc_id) partial aggregation
      .groupBy("term", "doc_id")
      .agg(F.count(F.lit(1)).as("tf"), F.max("dl").as("dl"))
      .select("term", "doc_id", "tf", "dl")
      .sortWithinPartitions("term")
  }

  /** The document-length expression [[docLengths]] and
    * [[postingsWithDl]] share — exposed so index ops can OBSERVE the
    * additive (count, sum dl) stats on a frame they already
    * materialize instead of paying a separate aggregation job. */
  def dlOf(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.size(TextFunctions.tokens(F.lower(text))).cast("long")

  /** Doc-length sidecar for [[postings]]: map-side only. */
  def docLengths(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    docs.select(F.col(idCol).cast("long").as("doc_id"),
      dlOf(F.col(textCol)).as("dl"))
  }

  /** BM25 served purely from the maintained index — no corpus access,
    * no driver-held state: per-term df reduces from the term-pruned
    * postings scan (`term IN (...)` reaches the parquet scan as a pushed
    * filter, so the serve reads posting row-groups for the query terms,
    * not the vocabulary). Must equal [[bm25TopK]] over the same corpus
    * bit-for-bit: postings/dl appends are lossless, df/dl/tf are exact
    * integers, and the scoring tail is the shared [[bm25Score]].
    *
    * `globalStats`: pass the maintained additive (n_docs, total_dl)
    * one-row reduce (see [[graft.streaming.Bm25Index]] — its stats table
    * is |ops|-row) to keep the serve free of corpus-sized scans; the
    * `None` default derives the stats by aggregating the dl sidecar,
    * which is an O(corpus) scan per serve — fine ad hoc, wrong at 10B
    * docs. */
  def bm25FromIndex(
      post: DataFrame,
      dls: DataFrame,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      globalStats: Option[DataFrame] = None): DataFrame = {
    require(terms.nonEmpty, "bm25FromIndex needs at least one query term")
    val hit = post.filter(F.col("term").isin(terms: _*))
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      F.coalesce(F.sum(F.when(F.col("term") === t, F.col("tf"))), F.lit(0L))
        .as(s"tf$i")
    }
    val pivoted = hit.groupBy("doc_id").agg(tfAggs.head, tfAggs.tail: _*)
    val base = pivoted.join(dls, Seq("doc_id"))
      .select(F.col("doc_id") +: F.col("dl") +:
        terms.indices.map(i => F.col(s"tf$i")): _*)
    val dfAggs = termDfAggs(terms)
    val dfs = hit.agg(dfAggs.head, dfAggs.tail: _*)
    val stats = globalStats.getOrElse(
        dls.agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("dl")).as("total_dl")))
      .crossJoin(dfs) // 1-row × 1-row scalar spine
    bm25Score(base, stats, terms.size, k1, b, k)
  }

  /** Per-term document-frequency aggregate columns over a flat postings
    * frame (one row per live (term, doc_id)) — shared by
    * [[bm25FromIndex]] and [[graft.streaming.Bm25Index]]'s serve. */
  def termDfAggs(terms: Seq[String]): Seq[Column] =
    terms.zipWithIndex.map { case (t, i) =>
      F.sum((F.col("term") === t).cast("long")).as(s"df$i")
    }

  /** Full BPE training loop — [[bpePairCounts]]' one-step primitive
    * iterated into an actual tokenizer trainer: each round counts
    * adjacent-symbol pairs over the weighted vocabulary, picks the top
    * pair (count desc, pair asc — total order), and applies the merge
    * greedily left-to-right through every word. Returns the learned
    * merge table (step, pair, cnt).
    *
    * Merge application is a plain string `replace` over a
    * separator-encoded symbol string (S = U+0001): each symbol is
    * wrapped as `S sym S`, so the search pattern `S a S S b S` matches
    * exactly at symbol boundaries, never inside a symbol, and two
    * matches can never overlap (each consumes its own wrapping) —
    * leftmost non-overlapping replace-all IS the BPE greedy scan,
    * identically in Spark and the SQL oracle. U+0001 cannot appear in
    * UTF-8 continuation bytes, so byte-wise replace is char-safe.
    *
    * Scale shape: the corpus reduces ONCE to (word, count) through one
    * partial-aggregated shuffle; every iteration after that is
    * vocabulary-sized (the classic BPE-at-scale layout — merge work is
    * O(vocab), never O(corpus)). The driver touches one row per step
    * (the argmax pair — bounded like heavyHitters' sketch head); the
    * per-step localCheckpoint keeps the iterated plan from growing.
    */
  def bpeTrain(
      docs: DataFrame,
      merges: Int = 5,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeCore(docs, merges, textCol)._1.toDF("step", "pair", "cnt")
      .select(F.col("step").cast("int").as("step"), F.col("pair"), F.col("cnt"))
  }

  /** Encode the corpus with its own learned BPE merges: train `merges`
    * steps ([[bpeTrain]]'s loop), then count each document's tokens and
    * post-merge SUBWORDS — the sequence-length accounting every token-
    * budgeted pipeline stage (chunking, packing, cost estimation) needs
    * under a real subword tokenizer instead of whitespace counts.
    *
    * Scale shape: the trained vocabulary maps word → subword count
    * (vocabulary-sized, broadcast); the corpus pass explodes tokens and
    * partial-aggregates two longs per document — the corpus text is
    * never re-segmented, only joined against the model. Zero-token
    * documents survive via the left join (0, 0).
    */
  def bpeEncode(
      docs: DataFrame,
      merges: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    subwordCountsFromVocab(docs, bpeCore(docs, merges, textCol)._2, textCol, idCol)

  /** Tokenizer FERTILITY by group — subword expansion per language (or
    * any stratum): for each group, document count, whitespace-token
    * count, and post-merge subword count under the corpus-trained BPE
    * model. `n_subwords / n_tokens` is the fertility a tokenizer-
    * selection pass compares across languages (a tokenizer that costs
    * 3× the subwords on one language silently taxes that language's
    * effective context budget); emitted as exact integers so the
    * consumer thresholds by cross-multiplication.
    *
    * Scale shape: [[bpeEncode]]'s accounting (trained vocabulary
    * broadcasts, corpus never re-segmented) plus a slim (id, group)
    * join and one |groups|-row aggregation.
    */
  def bpeFertility(
      docs: DataFrame,
      merges: Int = 5,
      groupCol: String = "lang",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    bpeEncode(docs, merges, textCol, idCol)
      .join(docs.select(F.col(idCol), F.col(groupCol)), Seq(idCol))
      .groupBy(groupCol)
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum("n_tokens").cast("long").as("n_tokens"),
        F.sum("n_subwords").cast("long").as("n_subwords"))

  /** Apply a GIVEN merge table — the production tokenizer shape: train
    * once ([[bpeTrain]]), persist the merge list, apply it to any
    * corpus without retraining. Each merge is one map-only string
    * replace over the (word, count) vocabulary of THIS corpus (no pair
    * counting, no driver argmax — a pipeline of N narrow
    * transformations), then the per-doc subword accounting of
    * [[bpeEncode]].
    *
    * Ordering contract: merges apply in the given order, each seeing
    * the previous merges' output — identical to the trainer's own
    * application, so `bpeApply(docs, bpeTrain(docs, n) pairs)` equals
    * `bpeEncode(docs, n)` (pinned in OperatorsSpec).
    */
  def bpeApply(
      docs: DataFrame,
      mergeTable: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val sep = "\u0001"
    val sep2 = sep + sep
    val toks = TextFunctions.tokens(F.lower(F.col(textCol)))
    val vocab0 = docs.select(F.explode(toks).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("n"))
      .select(F.col("w"), F.col("n"),
        F.concat(F.lit(sep),
          F.array_join(F.split(F.col("w"), ""), sep2), F.lit(sep)).as("enc"))
    val vocab = mergeTable.foldLeft(vocab0) { (v, pair) =>
      val Array(a, b) = pair.split(" ", 2)
      v.withColumn("enc",
        F.call_function("replace", F.col("enc"),
          F.lit(sep + a + sep2 + b + sep), F.lit(sep + a + b + sep)))
    }
    subwordCountsFromVocab(docs, vocab, textCol, idCol)
  }

  /** Word-level BPE codec table — the id-space half of the tokenizer:
    * train `merges` steps, number the final SYMBOL inventory (id =
    * rank by symbol — the inventory is genuinely model-sized, base
    * characters plus at most `merges` merged symbols, so the unpinned
    * rank window runs over at most |alphabet|+merges rows), encode
    * every vocabulary word as its subword-id sequence, then DECODE by
    * joining the ids BACK to symbols and reassembling in position
    * order. Output per word: (w, n_ids, sum_ids, decoded) where
    * `decoded` is rebuilt from ids alone — the round-trip law
    * decode(encode(w)) == w is pinned as a property in PropertySpec
    * and graded corpus-wide by q_bpe_decode.
    *
    * Scale shape: everything here is vocabulary-sized (the corpus
    * reduced once inside [[bpeCore]]); the symbol inventory broadcasts
    * both ways and the reassembly aggregate is bounded by each word's
    * own subword count.
    */
  def bpeWordCodec(
      docs: DataFrame,
      merges: Int = 5,
      textCol: String = "text"): DataFrame = {
    val sep2 = "\u0001\u0001"
    val vocab = bpeCore(docs, merges, textCol)._2
    val wsy = vocab.select(F.col("w"),
      F.split(F.expr("substring(enc, 2, length(enc) - 2)"), sep2).as("syms"))
    val inv = wsy.select(F.explode(F.col("syms")).as("sym")).distinct()
      .withColumn("sid", F.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("sym")).cast("long"))
    // encode: (w, pos, sid) — the original symbol is DROPPED here so the
    // decode below genuinely reconstructs from ids only
    val encoded = wsy
      .select(F.col("w"), F.posexplode(F.col("syms")).as(Seq("pos", "sym")))
      .join(F.broadcast(inv), Seq("sym"))
      .select("w", "pos", "sid")
    encoded
      .join(F.broadcast(inv), Seq("sid"))
      .groupBy("w")
      .agg(F.count(F.lit(1)).as("n_ids"),
        F.sum("sid").as("sum_ids"),
        F.concat_ws("",
          F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("sym")))),
            x => x.getField("sym"))).as("decoded"))
  }

  /** Per-doc (n_tokens, n_subwords) from a separator-encoded vocab —
    * the shared accounting tail of [[bpeEncode]] and [[bpeApply]].
    */
  private def subwordCountsFromVocab(
      docs: DataFrame,
      vocab: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val sep2 = "\u0001\u0001"
    val wsub = vocab.select(F.col("w"),
      F.size(F.split(F.expr("substring(enc, 2, length(enc) - 2)"), sep2))
        .cast("long").as("ns"))
    val toks = TextFunctions.tokens(F.lower(F.col(textCol)))
    val perDoc = docs.select(F.col(idCol), F.explode(toks).as("w"))
      .join(F.broadcast(wsub), Seq("w"))
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_tokens"), F.sum(F.col("ns")).as("n_subwords"))
    docs.select(F.col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(F.col(idCol),
        F.coalesce(F.col("n_tokens"), F.lit(0L)).as("n_tokens"),
        F.coalesce(F.col("n_subwords"), F.lit(0L)).as("n_subwords"))
  }

  /** The shared trainer loop: returns (learned merge table, final vocab
    * (w, n, enc) with the separator-encoded symbol string).
    */
  private def bpeCore(
      docs: DataFrame,
      merges: Int,
      textCol: String): (Seq[(Int, String, Long)], DataFrame) = {
    require(merges > 0, "merges must be positive")
    val spark = docs.sparkSession
    graft.GraftFunctions.register(spark)
    val sep = "\u0001"
    val sep2 = sep + sep
    val toks = TextFunctions.tokens(F.lower(F.col(textCol)))
    var vocab = docs.select(F.explode(toks).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("n"))
      .select(F.col("w"), F.col("n"),
        F.concat(F.lit(sep),
          F.array_join(F.split(F.col("w"), ""), sep2), F.lit(sep)).as("enc"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val top = vocab
        .select(F.col("n"),
          F.split(F.expr("substring(enc, 2, length(enc) - 2)"), sep2).as("sy"))
        .select(F.col("n"), F.explode(
          // interpreted-HOF audit: the lambda reads ELEMENTS of the
          // materialized `sy` attribute — intended evaluation count
          F.when(F.size(F.col("sy")) >= 2,
            F.transform(F.sequence(F.lit(1), F.size(F.col("sy")) - 1),
              i => F.concat(F.element_at(F.col("sy"), i), F.lit(" "),
                F.element_at(F.col("sy"), i + 1))))
            .otherwise(F.array().cast("array<string>"))).as("pair"))
        .groupBy("pair").agg(F.sum(F.col("n")).as("cnt"))
        .orderBy(F.col("cnt").desc, F.col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        learned += ((step, pair, top(0).getLong(1)))
        val Array(a, b) = pair.split(" ", 2)
        vocab = vocab.withColumn("enc",
          F.call_function("replace", F.col("enc"),
            F.lit(sep + a + sep2 + b + sep), F.lit(sep + a + b + sep)))
          .localCheckpoint()
        step += 1
      }
    }
    (learned.toSeq, vocab)
  }

  /** Lexical candidate ranking by DISTINCT-token overlap: for each
    * query document, corpus documents ranked by the number of shared
    * distinct tokens (ties to the smaller id) — the sparse half of a
    * hybrid retrieval stack, generated through the inverted-index join
    * (a candidate appears only if it shares a term).
    *
    * Scale shape: the term join is the posting-list intersection; with
    * a web-scale vocabulary, bound it by composing a df filter on the
    * term table first (the co-occurrence query's vocabulary rule —
    * stopwords are what explode this join, and they carry no signal).
    * The per-query cut is the bounded top-k sketch aggregate (k-element
    * partial state per map task), not a window sort of the full
    * candidate set.
    */
  def lexicalOverlapTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def dt(df: DataFrame, out: String) = df.select(
      F.col(idCol).cast("long").as(out),
      F.explode(F.array_distinct(
        TextFunctions.tokens(F.lower(F.col(textCol))))).as("term"))
    val scored = dt(queries, "query_id").join(dt(corpus, "doc_id"), Seq("term"))
      .filter(F.col("query_id") =!= F.col("doc_id"))
      .groupBy("query_id", "doc_id")
      .agg(F.count(F.lit(1)).as("ov"))
      // topk_pairs ranks score DESC with ids ascending on ties — the
      // (ov desc, doc asc) order; counts are exact in a double
      .select(F.col("query_id"), F.col("doc_id").as("neighbor_id"),
        F.col("ov").cast("double").as("score"))
    graft.operators.Similarity.explodeTopK(scored, k)
      .select(F.col("query_id"), F.col("neighbor_id").as("doc_id"),
        F.col("score").cast("long").as("ov"), F.col("rank"))
  }

  /** Reciprocal-rank fusion — the fusion layer of a hybrid (dense +
    * sparse) retrieval stack: two per-query rankings merge by
    * `sum(floor(scale / (c + rank)))`, the RRF formula made
    * integer-exact (scale 2^20, c = 60, the standard constant). A
    * document missing from one list simply contributes nothing —
    * exactly RRF's semantics. Output: (query_id, doc_id, rrf, n_lists,
    * rank) with deterministic id tie-breaks; n_lists tells you whether
    * dense and sparse AGREED, the signal hybrid search exists for.
    *
    * Scale shape: inputs are already bounded top-k lists (k rows per
    * query), so the union, the fused aggregate, and the final per-query
    * window all run on k-bounded groups — nothing here ever touches a
    * corpus-sized table.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      k: Int,
      c: Long = 60L,
      scale: Long = 1L << 20): DataFrame = {
    def pts(df: DataFrame) = df.select(F.col("query_id"), F.col("doc_id"),
      F.expr(s"CAST($scale AS BIGINT) div (CAST($c AS BIGINT) + CAST(rank AS BIGINT))").as("pts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(F.col("rrf").desc, F.col("doc_id").asc)
    pts(a).unionByName(pts(b))
      .groupBy("query_id", "doc_id")
      .agg(F.sum("pts").as("rrf"), F.count(F.lit(1)).as("n_lists"))
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "doc_id", "rrf", "n_lists", "rank")
  }

  /** Positional phrase search served from a POSITIONAL inverted index:
    * postings (doc, pos) are built for the phrase's terms ONLY (the
    * term filter prunes before anything joins), the first term anchors,
    * and each subsequent term must appear at anchor + i — one
    * (doc_id, aligned-pos) equi-join per extra term, the classic
    * positional-index intersection. Output: (doc_id, n_matches) for
    * matching documents.
    *
    * Scale shape: the per-term postings lists are df(term)-sized, not
    * corpus-sized (the isin filter reaches the token explode); every
    * join is an equi-join on (doc, pos−offset) between postings lists;
    * nothing corpus-sized survives past the first projection. The same
    * intersect-shortest-first discipline a Lucene positional query
    * runs, expressed as relational joins.
    */
  def phraseSearch(
      docs: DataFrame,
      phrase: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two terms")
    val posts = docs
      .select(F.col(idCol).cast("long").as("doc_id"),
        F.posexplode(TextFunctions.tokens(F.lower(F.col(textCol))))
          .as(Seq("pos", "term")))
      .filter(F.col("term").isin(phrase: _*))
    val anchor = posts.filter(F.col("term") === phrase.head)
      .select(F.col("doc_id"), F.col("pos"))
    phrase.zipWithIndex.drop(1)
      .foldLeft(anchor) { case (acc, (w, i)) =>
        acc.join(
          posts.filter(F.col("term") === w)
            .select(F.col("doc_id"), (F.col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("n_matches"))
  }

  /** Proximity (NEAR/slop) search — the unordered companion of
    * [[phraseSearch]]: count position pairs of two terms within `slop`
    * tokens of each other in the same document. The join is doc-EQUI
    * with the |posA − posB| <= slop band as a post-join filter — the
    * per-doc postings lists are tiny (df-bounded), so the band never
    * multiplies anything corpus-sized; this is the positional-index
    * NEAR operator, not a corpus range join.
    */
  def proximitySearch(
      docs: DataFrame,
      termA: String,
      termB: String,
      slop: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(slop >= 1 && termA != termB, "slop >= 1, distinct terms")
    def posts(term: String) = docs
      .select(F.col(idCol).cast("long").as("doc_id"),
        F.posexplode(TextFunctions.tokens(F.lower(F.col(textCol))))
          .as(Seq("pos", "term")))
      .filter(F.col("term") === term)
      .select(F.col("doc_id"), F.col("pos"))
    posts(termA).as("a")
      .join(posts(termB).withColumnRenamed("pos", "pos_b"), Seq("doc_id"))
      .filter(F.abs(F.col("pos") - F.col("pos_b")) <= slop)
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("n_pairs"))
  }
}
