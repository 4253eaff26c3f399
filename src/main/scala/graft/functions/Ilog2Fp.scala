package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-point integer log2 as a NATIVE codegen expression:
  * `floor-ish log2(x) · 2^fracBits` by bit length (integer part) +
  * `fracBits` rounds of the classical normalize/square digit recurrence
  * (fraction) — bit-identical to the column-chain formulation in
  * [[graft.operators.Corpus.withIlog2Fp]] and to the DuckDB oracles'
  * CTE restatement, but ONE whole-stage-codegen expression instead of
  * ~5·fracBits projected columns. That matters on the hot paths where
  * the fp chain runs per corpus-sized row (character entropy's
  * (doc, char) table) rather than per vocabulary row.
  *
  * Contract: defined for x > 0 (counts). Non-positive input yields 0
  * rather than throwing — callers feed aggregation counts, which are
  * ≥ 1 by construction; the 0 keeps codegen branch-free on nulls gone
  * wrong rather than poisoning a 100 TB job.
  *
  * The mantissa normalizes into [2^20, 2^21) by SHIFTING, so inputs up
  * to 2^62 cannot overflow and squares stay under 2^42 — same headroom
  * analysis as the column version.
  */
case class Ilog2Fp(child: Expression, fracBits: Int) extends UnaryExpression {
  require(fracBits >= 0 && fracBits <= 16, "fracBits in [0,16]")

  override def dataType: DataType = LongType
  override def prettyName: String = "ilog2_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ilog2_fp requires BIGINT input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    if (v <= 0L) 0L
    else {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
      var m = if (msb >= 20) v >>> (msb - 20) else v << (20 - msb)
      var f = 0L
      var i = 0
      while (i < fracBits) {
        val sq = (m * m) >> 20
        if (sq >= 2097152L) { f = f * 2 + 1; m = sq >> 1 }
        else { f = f * 2; m = sq }
        i += 1
      }
      msb.toLong * (1L << fracBits) + f
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val msb = ctx.freshName("msb")
    val m = ctx.freshName("m")
    val f = ctx.freshName("f")
    val i = ctx.freshName("i")
    val sq = ctx.freshName("sq")
    nullSafeCodeGen(ctx, ev, v =>
      s"""if ($v <= 0L) {
         |  ${ev.value} = 0L;
         |} else {
         |  int $msb = 63 - java.lang.Long.numberOfLeadingZeros($v);
         |  long $m = $msb >= 20 ? ($v >>> ($msb - 20)) : ($v << (20 - $msb));
         |  long $f = 0L;
         |  for (int $i = 0; $i < $fracBits; $i++) {
         |    long $sq = ($m * $m) >> 20;
         |    if ($sq >= 2097152L) { $f = $f * 2 + 1; $m = $sq >> 1; }
         |    else { $f = $f * 2; $m = $sq; }
         |  }
         |  ${ev.value} = ((long) $msb) * ${1L << fracBits}L + $f;
         |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Ilog2Fp =
    copy(child = newChild)
}
