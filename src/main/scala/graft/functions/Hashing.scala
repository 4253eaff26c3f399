package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
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

  // ---- md5-derived, engine-reproducible hashing ----------------------
  //
  // The production sketches above use xxhash/splitmix mixing — fast, but
  // private to this engine, so no independent oracle can replay them.
  // The md5 family below trades ~5x hash cost for exact cross-engine
  // reproducibility: every value is derived from the md5 of a string,
  // which any engine computes identically (DuckDB:
  // CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)). Seeded hash
  // families come from one md5 base per shingle plus affine mixing
  // (a_j*h + b_j) mod p over the Mersenne prime p = 2^31-1 — classic
  // universal hashing (Carter & Wegman 1979), and every intermediate
  // fits a 64-bit signed integer so SQL engines reproduce it exactly.

  val P31 = 2147483647L // 2^31 - 1

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 32 bits of md5(utf8(s)) as an unsigned value in [0, 2^32). */
  def md5Int(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** Affine-mix constants for seed j: a in [1, p-1], b in [0, p-1], both
    * md5-derived so the oracle regenerates them from the same strings.
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()

  private def affineSeeds(k: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(k, _ => {
      val a = new Array[Long](k)
      val b = new Array[Long](k)
      var j = 0
      while (j < k) {
        a(j) = md5Int("a:" + j) % (P31 - 1) + 1
        b(j) = md5Int("b:" + j) % P31
        j += 1
      }
      (a, b)
    })

  /** Distinct character n-gram substrings of `s` (whole string when
    * shorter than n), sorted — the exact-set counterpart of
    * [[rollingShingleHashes]] for oracle-verifiable Jaccard.
    */
  def distinctCharShingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val set = new java.util.TreeSet[String]()
    if (len < n) set.add(str)
    else {
      var i = 0
      while (i <= len - n) { set.add(str.substring(i, i + n)); i += 1 }
    }
    val out = new Array[AnyRef](set.size)
    var w = 0
    val it = set.iterator()
    while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles of `s` (lowercased, whitespace-split;
    * fewer than n tokens collapse to one whole-text shingle), sorted —
    * the compiled counterpart of the interpreted
    * [[TextFunctions.wordShingles]] HOF, which re-tokenizes per lambda
    * eval and dominates corpus-wide shingling cost.
    */
  def distinctWordShingles(s: UTF8String, n: Int): ArrayData = {
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    // SPACE-only trim, exactly like Spark's trim() (Java's String.trim
    // also strips \t/\n, which would diverge from the HOF + oracle)
    var b = 0
    var e = lowered.length
    while (b < e && lowered.charAt(b) == ' ') b += 1
    while (e > b && lowered.charAt(e - 1) == ' ') e -= 1
    val str = lowered.substring(b, e)
    val toks: Array[String] =
      if (str.isEmpty) Array.empty[String] else str.split("\\s+")
    val set = new java.util.TreeSet[String]()
    if (toks.length < n) set.add(toks.mkString(" "))
    else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        set.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[AnyRef](set.size)
    var w = 0
    val it = set.iterator()
    while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
    new GenericArrayData(out)
  }

  /** md5-based k-seed MinHash signature over the distinct character
    * n-gram shingles of `s`: sig(j) = min over shingles of
    * (a_j * (md5_32(shingle) mod p) + b_j) mod p. One md5 per distinct
    * shingle; k affine mixes per shingle — the same one-string-hash +
    * cheap-remix shape as the fast path, but bit-reproducible in SQL.
    */
  def md5MinhashSig(s: UTF8String, n: Int, k: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val set = new java.util.HashSet[String]()
    if (len < n) set.add(str)
    else {
      var i = 0
      while (i <= len - n) { set.add(str.substring(i, i + n)); i += 1 }
    }
    val bases = new Array[Long](set.size)
    var w = 0
    val it = set.iterator()
    while (it.hasNext) { bases(w) = md5Int(it.next()) % P31; w += 1 }
    val (as, bs) = affineSeeds(k)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = as(j); val b = bs(j)
      var best = Long.MaxValue
      var i = 0
      while (i < bases.length) {
        val v = (a * bases(i) + b) % P31
        if (v < best) best = v
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** md5-based 64-bit SimHash of a token array, returned as two unsigned
    * 32-bit halves (hi = md5 hex chars 1-8 of each token, lo = chars
    * 9-16): per bit, sum +1/-1 across token OCCURRENCES; positive sum
    * sets the bit. Split halves keep every value in [0, 2^32) so SQL
    * engines reproduce them without signed-overflow edge cases.
    *
    * @return InternalRow(sim_hi: Long, sim_lo: Long)
    */
  def md5Simhash(arr: ArrayData): InternalRow = {
    val counts = new Array[Int](64)
    val d = md5Local.get()
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        d.reset()
        val bytes = d.digest(
          arr.getUTF8String(i).toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hi = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
          ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
        val lo = ((bytes(4) & 0xffL) << 24) | ((bytes(5) & 0xffL) << 16) |
          ((bytes(6) & 0xffL) << 8) | (bytes(7) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((hi >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          if (((lo >>> b) & 1L) == 1L) counts(32 + b) += 1 else counts(32 + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var hiSig = 0L
    var loSig = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) hiSig |= (1L << b)
      if (counts(32 + b) > 0) loSig |= (1L << b)
      b += 1
    }
    InternalRow(hiSig, loSig)
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

/** `char_shingles(text, n)`: sorted distinct character n-gram substrings
  * (whole string when shorter than n) — compiled counterpart of the
  * HOF-based [[TextFunctions.charShingles]], for exact Jaccard verify.
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingles requires STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    HashingUtil.distinctCharShingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingUtil.distinctCharShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** `word_shingles(text, n)`: sorted distinct word n-gram shingles
  * (lowercased), compiled — see [[HashingUtil.distinctWordShingles]].
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    HashingUtil.distinctWordShingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingUtil.distinctWordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `md5_minhash_sig(text, n, k)`: engine-reproducible MinHash signature
  * (md5 base hashes + affine mixing mod 2^31-1) over distinct character
  * n-gram shingles — see [[HashingUtil.md5MinhashSig]].
  */
case class Md5MinhashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_minhash_sig requires STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    HashingUtil.md5MinhashSig(s.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingUtil.md5MinhashSig($c, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): Md5MinhashSig =
    copy(child = newChild)
}

/** `md5_simhash(tokens)`: struct(sim_hi, sim_lo) — engine-reproducible
  * 64-bit SimHash as two unsigned 32-bit halves, see
  * [[HashingUtil.md5Simhash]].
  */
case class Md5Simhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sim_hi", LongType, nullable = false),
    StructField("sim_lo", LongType, nullable = false)))
  override def prettyName: String = "md5_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_simhash requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    HashingUtil.md5Simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingUtil.md5Simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Simhash =
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
  def charShingles(text: Column, n: Int): Column =
    F.call_function("char_shingles", text, F.lit(n))
  def wordShingles(text: Column, n: Int): Column =
    F.call_function("word_shingles", text, F.lit(n))
  def md5MinhashSig(text: Column, n: Int, k: Int): Column =
    F.call_function("md5_minhash_sig", text, F.lit(n), F.lit(k))
  def md5Simhash(tokens: Column): Column =
    F.call_function("md5_simhash", tokens)
}
