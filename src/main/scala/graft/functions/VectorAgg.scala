package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** Mutable element-wise long-vector sum buffer. Dimension is fixed by the
  * first vector seen; a dimension mismatch is a loud error (silent
  * truncation would corrupt centroid math).
  */
final class VecSumBuffer {
  var sums: Array[Long] = null
  var n: Long = 0L

  def add(v: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val d = v.numElements()
    if (sums == null) sums = new Array[Long](d)
    else require(sums.length == d,
      s"sum_vec_l: dimension mismatch (${sums.length} vs $d)")
    var i = 0
    while (i < d) {
      // a null COMPONENT would silently corrupt centroid math (getLong
      // on a null slot is undefined) — same loud-error policy as the
      // dimension check
      require(!v.isNullAt(i), s"sum_vec_l: null element at index $i")
      sums(i) += v.getLong(i)
      i += 1
    }
    n += 1L
  }

  def merge(other: VecSumBuffer): Unit = {
    if (other.sums != null) {
      if (sums == null) { sums = other.sums.clone(); n = other.n }
      else {
        require(sums.length == other.sums.length,
          s"sum_vec_l: dimension mismatch (${sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
        n += other.n
      }
    }
  }
}

/** `sum_vec_l(array<bigint>)`: element-wise sum of long vectors across the
  * group — the partial-aggregable reduction a distributed k-means (Lloyd)
  * step needs: per-cell component sums travel as ONE fixed-width array
  * through map-side partial aggregation, so the shuffle carries
  * O(cells × dims) longs regardless of corpus size. Null vectors are
  * skipped; an all-null group yields an empty array.
  */
case class VectorSumL(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    vec.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sum_vec_l requires ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = vec.eval(input)
    if (v != null) buf.add(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: VecSumBuffer): Any =
    new GenericArrayData(
      if (buf.sums == null) Array.emptyLongArray else buf.sums)

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val d = if (buf.sums == null) -1 else buf.sums.length
    out.writeInt(d); out.writeLong(buf.n)
    var i = 0
    while (i < d) { out.writeLong(buf.sums(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new VecSumBuffer
    buf.n = in.readLong()
    if (d >= 0) {
      buf.sums = new Array[Long](d)
      var i = 0
      while (i < d) { buf.sums(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumL =
    copy(vec = newChildren.head)
  override def prettyName: String = "sum_vec_l"
}

object VectorAgg {
  /** Column API — requires [[graft.GraftFunctions.register]]. */
  def sumVecL(v: Column): Column = F.call_function("sum_vec_l", v)
}
