package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs in a
  * binary min-heap keyed by "worst first", so insertion is O(log k) and
  * the buffer never exceeds k entries regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  // parallel arrays as a binary heap; heap root = current worst element
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true if (s1,i1) ranks WORSE than (s2,i2): lower score, or same score
    * and higher id.
    */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up (heap property: parent is worse than children)
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(p); ids(i) = ids(p)
          scores(p) = ts; ids(p) = ti
          i = p
        } else i = -1
        if (i == -1) return
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      // replace the worst and sift down
      scores(0) = s; ids(0) = id
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) return
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(w); ids(i) = ids(w)
        scores(w) = ts; ids(w) = ti
        i = w
      }
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Best-first (score desc, id asc) snapshot. */
  def sorted: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    out.sortBy { case (s, id) => (-s, id) }
  }
}

/** `topk_pairs(score, id, k)`: aggregate returning the k best
  * (score desc, id asc) pairs as array<struct<score,id>>.
  *
  * This is the scale-correct per-group top-k: as a
  * TypedImperativeAggregate it participates in partial aggregation, so
  * every map task reduces its slice to <= k pairs per group and the
  * shuffle carries k-element sketches — versus a window row_number(),
  * which shuffles and sorts EVERY candidate row per group. For
  * brute-force ANN over a large corpus that is the difference between
  * shuffling |corpus| rows and shuffling k rows per query.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs requires (DOUBLE, BIGINT), got (${s.catalogString}, ${i.catalogString})")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt(); val n = in.readInt()
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

/** Bounded "k smallest ids" buffer: a size-k binary max-heap (root =
  * largest kept id), so inserting from a bucket of ANY cardinality costs
  * O(log k) and the buffer never exceeds k longs. This is what caps
  * LSH-bucket materialization per MAP TASK: the partial aggregation
  * buffer is bounded before the shuffle, where a collect_list would
  * materialize the whole bucket on one reducer first.
  */
final class MinKBuffer(val k: Int) {
  val ids = new Array[Long](k)
  var size = 0

  def add(id: Long): Unit = {
    if (size < k) {
      var i = size
      ids(i) = id; size += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (ids(i) > ids(p)) {
          val t = ids(i); ids(i) = ids(p); ids(p) = t; i = p
        } else return
      }
    } else if (k > 0 && id < ids(0)) {
      ids(0) = id
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && ids(l) > ids(m)) m = l
        if (r < size && ids(r) > ids(m)) m = r
        if (m == i) return
        val t = ids(i); ids(i) = ids(m); ids(m) = t
        i = m
      }
    }
  }

  def merge(other: MinKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.ids(i)); i += 1 }
  }

  /** Ascending snapshot — identical to slice(sort_array(collect_list), 1, k). */
  def sorted: Array[Long] = {
    val out = java.util.Arrays.copyOf(ids, size)
    java.util.Arrays.sort(out)
    out
  }
}

/** `min_k_ids(id, k)`: aggregate returning the k smallest BIGINT values
  * of the group as a sorted array. Result-equivalent to
  * `slice(sort_array(collect_list(id)), 1, k)` but memory-bounded: as a
  * TypedImperativeAggregate it participates in partial aggregation, so a
  * degenerate group (an LSH bucket full of boilerplate documents) costs
  * each map task k longs, and the shuffle carries k-element sketches —
  * never the full bucket.
  */
case class MinKIds(
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] {

  override def children: Seq[Expression] = Seq(id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    id.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_k_ids requires BIGINT, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = id.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MinKBuffer): Any =
    new GenericArrayData(buf.sorted)

  override def serialize(buf: MinKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.ids(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt(); val n = in.readInt()
    val buf = new MinKBuffer(kk)
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKIds =
    copy(id = newChildren.head)
  override def prettyName: String = "min_k_ids"
}

object TopK {
  /** Column API — requires [[graft.GraftFunctions.register]]. */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    F.call_function("topk_pairs", score, id, F.lit(k))

  /** Column API — requires [[graft.GraftFunctions.register]]. */
  def minKIds(id: Column, k: Int): Column =
    F.call_function("min_k_ids", id, F.lit(k))
}
