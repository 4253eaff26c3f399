package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Interval (range) join: points matched to arbitrary `[lo, hi)` bands.
  *
  * A direct theta-join (`p.v >= r.lo AND p.v < r.hi`) has no equi-key,
  * so Spark plans a BroadcastNestedLoopJoin — O(points x ranges) work
  * per partition, a scale-killer the moment the range table outgrows a
  * broadcast. The standard decomposition is bucketization: pick a fixed
  * `bucketWidth`, explode each range to the buckets it covers, compute
  * each point's single bucket, EQUI-join on the bucket id, then apply
  * the exact bound filter. The shuffle key is the 8-byte bucket id; the
  * fan-out per range is ceil(width / bucketWidth) — tunable, and the
  * plan is a hash join, never a nested loop.
  */
object RangeJoin {

  /** @param points      table with a numeric `pointCol`
    * @param ranges      table with numeric `[loCol, hiCol)` bounds
    * @param bucketWidth fixed bucket size; choose ~ the typical range
    *                    width so most ranges explode to 1-2 buckets
    */
  def bucketed(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      bucketOf(F.col(pointCol), points.schema(pointCol).dataType, bucketWidth))
    // inclusive bucket span [floor(lo/W), floor(hi/W)]: the last bucket
    // may be empty when hi lands on a boundary — the exact filter below
    // discards any false candidates it contributes
    val rb = ranges.withColumn("__bucket",
      F.explode(F.sequence(
        bucketOf(F.col(loCol), ranges.schema(loCol).dataType, bucketWidth),
        bucketOf(F.col(hiCol), ranges.schema(hiCol).dataType, bucketWidth))))
    pb.join(rb, Seq("__bucket"))
      .filter(F.col(pointCol) >= F.col(loCol) && F.col(pointCol) < F.col(hiCol))
      .drop("__bucket")
  }

  /** Bucket id = floor(value / width), computed EXACTLY for integral
    * columns: Spark's `/` is double division, which loses ulp precision
    * above 2^53 and can misplace a value by one bucket — a MISSED match
    * the exact post-filter cannot recover (it only removes false
    * positives). `x - pmod(x, w)` is the largest multiple of w <= x
    * (pmod is non-negative), and integral `div` on an exact multiple is
    * the floor quotient, all in 64-bit integer arithmetic.
    */
  private def bucketOf(c: Column, dt: DataType, w: Long): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      val x = c.cast("long")
      F.call_function("div", x - F.pmod(x, F.lit(w)), F.lit(w))
    case _ => F.floor(c / w).cast("long")
  }
}
