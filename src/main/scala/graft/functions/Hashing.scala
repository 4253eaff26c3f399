package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive-loop hashing kernels for the sketch operators (MinHash,
  * SimHash). These exist because Spark's higher-order functions
  * (transform/aggregate) are interpreted, not codegen'd, and lambda
  * expressions defeat subexpression elimination — a k x m-element sketch
  * through HOFs costs k*m interpreted eval() walks per row, which is
  * minutes at corpus scale. Here the same math is a tight compiled loop:
  * one rolling-hash pass over the text and one k x m long-mix loop.
  *
  * All kernels are deterministic pure functions of their input (no RNG,
  * no time), so sketches are reproducible across runs and engines
  * compiled from this source.
  */
object HashingUtil {

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distinct rolling (Rabin-Karp) hashes of every `n`-char window of `s`,
    * O(len) total via the rolling update, each window finalized with
    * mix64. Returns the sorted distinct hash set (MinHash is a set
    * sketch; sorting makes downstream band slicing deterministic).
    */
  def rollingShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len == 0) return new GenericArrayData(Array.empty[Long])
    val eff = math.min(n, len)
    val B = 1000003L
    var bPow = 1L // B^(eff-1)
    var i = 1
    while (i < eff) { bPow *= B; i += 1 }
    val m = len - eff + 1
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < eff) { h = h * B + str.charAt(i); i += 1 }
    out(0) = mix64(h)
    i = 1
    while (i < m) {
      h = (h - str.charAt(i - 1) * bPow) * B + str.charAt(i + eff - 1)
      out(i) = mix64(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place unique
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** k-minima signature over a hash set: sig(j) = min over h of
    * mix64(h ^ seed(j)), the universal-hashing family derived from one
    * base hash per element. O(k*m) long ops, no allocation beyond the
    * output.
    */
  def minhashSignature(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val seed = mix64(j.toLong)
      var best = Long.MaxValue
      var i = 0
      while (i < m) {
        val v = mix64(hashes.getLong(i) ^ seed)
        if (v < best) best = v
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over element hashes: per bit, sum +-1 across
    * elements; sign becomes the bit. O(64*m) with no allocation.
    */
  def simhash64(hashes: ArrayData): Long = {
    val m = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** xxhash-free 64-bit string hash (FNV-1a over UTF-16 units, mixed) for
    * token-level sketches.
    */
  def hashString(s: UTF8String): Long = {
    val str = s.toString
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < str.length) {
      h = (h ^ str.charAt(i)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Hash every element of a string array (for token-level SimHash). */
  def hashStrings(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = if (arr.isNullAt(i)) 0L else hashString(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingle_hashes(text, n)`: sorted distinct rolling-hash values of all
  * n-char windows. Codegen'd via a static call into the compiled kernel.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    HashingUtil.rollingShingleHashes(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingUtil.rollingShingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `minhash_sig(hashes, k)`: k-minima MinHash signature of a long-array
  * hash set.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    HashingUtil.minhashSignature(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingUtil.minhashSignature($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `simhash64(string_array)`: 64-bit SimHash of a token array. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    HashingUtil.simhash64(HashingUtil.hashStrings(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingUtil.simhash64(" +
        s"graft.functions.HashingUtil.hashStrings($c));")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object Hashing {
  /** Column API (no registry needed — fixed literal params are baked into
    * the expression at plan time, so these go through call_function-free
    * construction via SQL strings). Requires GraftFunctions.register.
    */
  def shingleHashes(text: Column, n: Int): Column =
    F.call_function("shingle_hashes", text, F.lit(n))
  def minhashSig(hashes: Column, k: Int): Column =
    F.call_function("minhash_sig", hashes, F.lit(k))
  def simhash64(tokens: Column): Column =
    F.call_function("simhash64", tokens)
}
