package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.LongType

/** Physical-layout operators: multi-dimensional clustering for data
  * skipping.
  *
  * At 100 TB the scan is the dominant cost, and min/max (zone-map)
  * pruning is the only lever that shrinks it without an index: parquet
  * keeps per-row-group min/max for every column, and Spark's parquet
  * reader skips whole row groups whose stats exclude the pushed
  * predicate. A layout sorted on ONE column gives tight stats — and
  * therefore pruning — on that column only; a predicate on any other
  * column still reads every row group. Z-ORDER clustering (bit-
  * interleaving the dimensions into a Morton code, then range-
  * partitioning + sorting on it) makes every row group a small
  * hyper-rectangle in the key space, so predicates on EITHER dimension
  * prune most row groups. Same idea as Delta Lake's OPTIMIZE ZORDER BY
  * and ClickHouse/Databricks liquid clustering; implemented here with
  * plain Column arithmetic (codegen'd, no UDF) + repartitionByRange, so
  * Catalyst sees an ordinary sort key.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Pure integer Column arithmetic — whole-stage
    * codegen'd, and exactly replayable in ANSI SQL (see
    * [[morton2Sql]]), which is what makes the operator oracle-gradable.
    *
    * `bits` ≤ 31 keeps the result in a positive BIGINT. Values wider
    * than `bits` bits alias into the same z-range (callers clamp or
    * rank first — [[clusterByZ]] documents the contract).
    */
  def morton2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val la = a.cast(LongType)
    val lb = b.cast(LongType)
    val terms = (0 until bits).flatMap { i =>
      Seq(
        F.shiftleft(F.shiftrightunsigned(la, i).bitwiseAND(F.lit(1L)), 2 * i),
        F.shiftleft(F.shiftrightunsigned(lb, i).bitwiseAND(F.lit(1L)), 2 * i + 1))
    }
    // Bit positions are disjoint, so + and | are equivalent; + keeps the
    // expression inside DuckDB's (and Spark's) plain-arithmetic fast path.
    terms.reduce(_ + _)
  }

  /** The identical interleave as ANSI SQL text over column expressions
    * `a` and `b` — spliced into oracle queries so DuckDB replays the
    * engine's z-values bit-for-bit.
    */
  def morton2Sql(a: String, b: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31)
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString(" + ")
  }

  /** Cluster `df` into `numFiles` range partitions of the z-value of
    * (`a`, `b`), sorted within each partition, ready to write. Written
    * as parquet this yields row groups whose (a, b) min/max boxes are
    * small hyper-rectangles: a predicate on either column prunes all
    * row groups whose box misses it (measured in LayoutSpec: a 1.5%
    * selectivity predicate on the NON-sort-order column reads ~3% of
    * rows from a z-ordered layout vs 100% from a single-column sort).
    *
    * Contract: `a` and `b` must be non-negative and < 2^bits for the
    * interleave to preserve locality (wider values alias). For columns
    * of arbitrary domain, rank/bucket them into [0, 2^bits) first —
    * `F.ntile` over a window for exact ranks at small scale, or the
    * percentile_approx sketch for a one-pass bucketing at 100 TB.
    *
    * Scale: the range partitioner samples the z-key distribution (one
    * extra pass over the sort key only), so partition bounds adapt to
    * density; no driver-side materialization anywhere.
    */
  def clusterByZ(
      df: DataFrame,
      a: String,
      b: String,
      numFiles: Int,
      bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__z", morton2(F.col(a), F.col(b), bits))
    keyed
      .repartitionByRange(numFiles, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
