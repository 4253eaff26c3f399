package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.{functions => F}

/** Embedding math over `array<float>` columns.
  *
  * Two tiers, same semantics:
  *  - [[DotF]] — a custom codegen'd Catalyst expression that loops over the
  *    primitive float arrays without per-element boxing. This is the hot
  *    path for brute-force similarity at scale: a 64-dim dot product per
  *    candidate pair is ~64 FMA ops when codegen'd, vs hundreds of ns of
  *    boxing through higher-order-function lambdas.
  *  - [[VectorFunctions.dotHof]] etc. — pure-builtin higher-order-function
  *    fallbacks (zip_with + aggregate), used as the reference
  *    implementation in tests and wherever the custom expression is not
  *    registered.
  *
  * The reference pipeline has no vector ops (SURVEY.md §2.9); these back
  * the similarity-search / near-dup extensions (build plan §7.2 step 7).
  */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f requires (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd integer dot product over `array<bigint>` columns — the
  * scoring kernel for the quantized (engine-reproducible) similarity
  * path: `floor(x*1000)` vectors make every score an exact BIGINT, so
  * ANN results can be verified bit-for-bit by an independent SQL engine.
  */
case class DotL(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_l"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_l requires (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotL =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_f takes exactly 2 arguments")
    DotF(exprs.head, exprs(1))
  }

  /** Codegen'd dot product — requires [[graft.GraftFunctions.register]]. */
  def dot(a: Column, b: Column): Column = F.call_function("dot_f", a, b)

  /** Codegen'd integer dot over `array<bigint>` — requires
    * [[graft.GraftFunctions.register]].
    */
  def dotL(a: Column, b: Column): Column = F.call_function("dot_l", a, b)

  /** Standard embedding quantization: floor(x * 1000) as BIGINT. Exact in
    * IEEE double in any engine (float widens exactly; *1000 and floor are
    * single IEEE ops), so quantized dot products and norms are integers
    * that match bit-for-bit across engines — the foundation of the
    * oracle-checkable ANN/near-dup path.
    */
  def quantize(v: Column): Column =
    F.transform(v, x => F.floor(x.cast(DoubleType) * 1000).cast("long"))

  /** Builtin-only dot product (zip_with + aggregate HOFs). */
  def dotHof(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      F.lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = F.sqrt(dotHof(a, a))

  /** Cosine similarity; null-safe for zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column =
    dotHof(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))

  /** Cosine using the codegen'd dot (hot path). */
  def cosineFast(a: Column, b: Column): Column =
    dot(a, b) / F.nullif(F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)), F.lit(0.0))

  /** Average-pooling "resize" of a feature vector to `outDim` dimensions
    * (the multimodal resize stand-in: contiguous chunks averaged). Not a
    * hot-path op — used on already-decoded feature rows. Interpreted-HOF
    * audit: the lambda slices `v` once per OUTPUT dim (outDim is small
    * and fixed); pass `v` as an attribute so nothing expensive rides
    * into the per-element re-evaluation.
    */
  def avgPool(v: Column, outDim: Int): Column = {
    val step = F.ceil(F.size(v) / F.lit(outDim.toDouble)).cast("int")
    F.transform(F.sequence(F.lit(0), F.lit(outDim - 1)), j => {
      val chunk = F.slice(v, j * step + F.lit(1), step)
      F.aggregate(chunk, F.lit(0.0), (acc, x) => acc + x.cast(DoubleType)) /
        F.greatest(F.size(chunk), F.lit(1)).cast(DoubleType)
    })
  }
}
