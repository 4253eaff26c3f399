package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{MinHashSig, ShingleHashes, SimHash64, VectorFunctions, WeekOfMonth}

/** Registration of the engine's custom Catalyst expressions on a session,
  * making them available to both the Column API (via call_function) and
  * SQL text (spark.sql("... week_of_month(d) ...")).
  *
  * Query entry points call [[register]] unconditionally; a per-session
  * guard makes repeat calls free (and keeps "function replaced" warnings
  * out of the logs). The set holds sessions weakly so it never pins one.
  */
object GraftFunctions {

  private val registered: java.util.Set[SparkSession] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    if (!registered.add(spark)) return
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "week_of_month", WeekOfMonth.builder, "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_f", VectorFunctions.builder, "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_l",
      exprs => graft.functions.DotL(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashes(exprs.head, intLit(exprs(1), "shingle_hashes")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs.head, intLit(exprs(1), "minhash_sig")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "char_shingles",
      exprs => graft.functions.CharShingles(
        exprs.head, intLit(exprs(1), "char_shingles")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "word_shingles",
      exprs => graft.functions.WordShingles(
        exprs.head, intLit(exprs(1), "word_shingles")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "md5_minhash_sig",
      exprs => graft.functions.Md5MinhashSig(
        exprs.head, intLit(exprs(1), "md5_minhash_sig"),
        intLit(exprs(2), "md5_minhash_sig")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "md5_simhash",
      exprs => graft.functions.Md5Simhash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "ilog2_fp",
      exprs => graft.functions.Ilog2Fp(exprs.head, intLit(exprs(1), "ilog2_fp")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "gram_stats", exprs => graft.functions.GramStats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "script_counts",
      exprs => graft.functions.ScriptCounts(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "nfc", exprs => graft.functions.Nfc(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "script_tokens",
      exprs => graft.functions.ScriptTokens(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "repetition_stats",
      exprs => graft.functions.RepetitionStats(exprs.head), "scala_udf")
    // Aggregate functions are returned bare; the analyzer wraps them in
    // an AggregateExpression during resolution.
    reg.createOrReplaceTempFunction(
      "topk_pairs",
      exprs => graft.functions.TopKPairs(
        exprs.head, exprs(1), intLit(exprs(2), "topk_pairs")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "min_k_ids",
      exprs => graft.functions.MinKIds(
        exprs.head, intLit(exprs(1), "min_k_ids")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "sum_vec_l",
      exprs => graft.functions.VectorSumL(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "freq_sketch",
      exprs => graft.functions.FreqSketch(
        exprs.head, intLit(exprs(1), "freq_sketch")),
      "scala_udf")
    reg.createOrReplaceTempFunction("bloom_agg", bloomAggBuilder, "scala_udf")
    reg.createOrReplaceTempFunction(
      "might_contain", mightContainBuilder, "scala_udf")
  }

  /** Spark's own runtime-filter Bloom expressions, surfaced as callable
    * functions: `bloom_agg(xxhash64(col)[, est_items[, num_bits]])`
    * builds a binary Bloom filter; `might_contain(bloom, xxhash64(col))`
    * is the codegen'd membership probe. These are the exact kernels AQE
    * injects for runtime join filters — reused, not reimplemented.
    */
  private[graft] def bloomAggBuilder(exprs: Seq[Expression]): Expression =
    exprs match {
      case Seq(c) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
      case Seq(c, n) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
      case Seq(c, n, b) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
      case other => throw new IllegalArgumentException(
        s"bloom_agg expects 1-3 arguments, got ${other.length}")
    }

  private[graft] def mightContainBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) throw new IllegalArgumentException(
      s"might_contain expects 2 arguments (bloom, xxhash64(value)), got ${exprs.length}")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      exprs.head, exprs(1))
  }

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT parameter, got $other")
  }

  private[graft] def intLitOf(e: Expression): Int = intLit(e, "function")
}
