package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass exact gram statistics kernel. Exists so repetition scoring
  * is MAP-ONLY: the explode -> groupBy(doc, gram) -> groupBy(doc)
  * formulation shuffles one row per (document, gram) occurrence — at
  * corpus scale that is a shuffle of every token in the corpus. Here
  * the same counts come from a single hash-map pass per document inside
  * the scan, no shuffle at all. Keys are exact strings (UTF8String
  * equality), not hashes — results are oracle-grade.
  */
object GramStatsUtil {

  private val SPACE = UTF8String.fromString(" ")

  /** @return InternalRow(n_distinct: Long, max_freq: Long) over the
    *         string array's multiset.
    */
  def gramStats(arr: ArrayData): InternalRow = {
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var maxF = 0
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var c = counts.get(s)
        if (c == null) { c = new Array[Int](1); counts.put(s, c) }
        c(0) += 1
        if (c(0) > maxF) maxF = c(0)
      }
      i += 1
    }
    InternalRow(counts.size.toLong, maxF.toLong)
  }

  /** Token AND bigram stats in one pass over the token array (bigrams
    * built in-kernel as "tok[i] tok[i+1]"; arrays shorter than 2 tokens
    * collapse to one whole-text shingle, mirroring
    * [[graft.functions.TextFunctions.wordShingles]]).
    *
    * @return InternalRow(n_distinct_tok, max_tok_freq, max_bigram_freq)
    */
  def repetitionStats(arr: ArrayData): InternalRow = {
    // null elements are skipped entirely, matching gramStats: counts
    // ignore them and bigrams are formed over the REMAINING sequence —
    // the semantics of "filter nulls, then process"
    val tokCounts = new java.util.HashMap[UTF8String, Array[Int]]()
    val bigCounts = new java.util.HashMap[UTF8String, Array[Int]]()
    var maxTok = 0
    var maxBig = 0
    var nonNull = 0
    var prev: UTF8String = null
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        nonNull += 1
        var c = tokCounts.get(s)
        if (c == null) { c = new Array[Int](1); tokCounts.put(s, c) }
        c(0) += 1
        if (c(0) > maxTok) maxTok = c(0)
        if (prev != null) {
          val bg = UTF8String.concat(prev, SPACE, s)
          var bc = bigCounts.get(bg)
          if (bc == null) { bc = new Array[Int](1); bigCounts.put(bg, bc) }
          bc(0) += 1
          if (bc(0) > maxBig) maxBig = bc(0)
        }
        prev = s
      }
      i += 1
    }
    if (nonNull < 2) {
      maxBig = 1 // single whole-text shingle (even for empty docs: "")
    }
    InternalRow(tokCounts.size.toLong, maxTok.toLong, maxBig.toLong)
  }
}

/** `gram_stats(array<string>)`: struct(n_distinct, max_freq) of the
  * array's multiset — the integer numerators of repetition-based
  * quality rules, computed map-side.
  */
case class GramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_freq", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_stats requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    GramStatsUtil.gramStats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramStatsUtil.gramStats($c);")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

/** `repetition_stats(array<string>)`: struct(n_distinct_tok,
  * max_tok_freq, max_bigram_freq) of a token array — token and
  * in-kernel bigram counts in one pass, map-only.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct_tok", LongType, nullable = false),
    StructField("max_tok_freq", LongType, nullable = false),
    StructField("max_bigram_freq", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    GramStatsUtil.repetitionStats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramStatsUtil.repetitionStats($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object GramStatsF {
  /** Column API — requires [[graft.GraftFunctions.register]]. */
  def gramStats(arr: Column): Column = F.call_function("gram_stats", arr)

  /** Column API — requires [[graft.GraftFunctions.register]]. */
  def repetitionStats(arr: Column): Column =
    F.call_function("repetition_stats", arr)
}
