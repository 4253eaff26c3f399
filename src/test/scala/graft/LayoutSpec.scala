package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.Layout

/** Z-order clustering: the interleave itself, and the MEASURED row-group
  * skipping it buys. The second test is the point of the operator: the
  * same 400k rows written (a) sorted on x alone and (b) z-clustered on
  * (x, y), then scanned with a predicate on y — the scan's numOutputRows
  * metric counts rows surviving parquet row-group min/max pruning, so
  * layout (a) must read everything while (b) reads only the row groups
  * whose y-box intersects the window.
  */
class LayoutSpec extends SparkSpec {

  import Layout.morton2

  test("morton2 interleaves bits: known values and de-interleave round-trip") {
    val df = spark.range(0, 512).select(
      F.col("id").as("i"),
      (F.col("id") * 7919 % 65536).as("a"),
      (F.col("id") * 104729 % 65536).as("b"))
    val z = df.select(F.col("a"), F.col("b"), morton2(F.col("a"), F.col("b")).as("z")).collect()
    z.foreach { r =>
      val (a, b, zz) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // de-interleave on the driver and compare
      var (da, db) = (0L, 0L)
      (0 until 16).foreach { i =>
        da |= ((zz >> (2 * i)) & 1L) << i
        db |= ((zz >> (2 * i + 1)) & 1L) << i
      }
      assert(da == a && db == b, s"round-trip failed for ($a,$b): z=$zz -> ($da,$db)")
    }
    // spot values: (1,0)->1, (0,1)->2, (3,5)->39 (0b100111)
    val spot = spark.range(1).select(
      morton2(F.lit(1), F.lit(0)).as("z1"),
      morton2(F.lit(0), F.lit(1)).as("z2"),
      morton2(F.lit(3), F.lit(5)).as("z3")).head()
    assert(spot.getLong(0) == 1L && spot.getLong(1) == 2L && spot.getLong(2) == 39L)
  }

  test("morton2Sql is the same function (Spark replays the SQL text)") {
    val sql = Layout.morton2Sql("a", "b")
    val df = spark.range(0, 1000).select(
      (F.col("id") * 48271 % 65536).as("a"),
      (F.col("id") * 16807 % 65536).as("b"))
    val diff = df
      .withColumn("z_col", morton2(F.col("a"), F.col("b")))
      .withColumn("z_sql", F.expr(sql))
      .filter(F.col("z_col") =!= F.col("z_sql"))
      .count()
    assert(diff == 0L)
  }

  private def scanRowsRead(df: DataFrame): Long = {
    df.collect()
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    val scans = strip(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec found")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("clusterByZ layout prunes row groups on the non-sort dimension") {
    val n = 400000L
    val data = spark.range(0, n).select(
      F.col("id"),
      F.pmod(F.xxhash64(F.col("id")), F.lit(65536L)).as("x"),
      F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(65536L)).as("y"))

    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val linearPath = s"$base/linear"
    val zPath = s"$base/zorder"
    // small row groups so min/max pruning has granularity to work with
    data.repartitionByRange(8, F.col("x")).sortWithinPartitions("x")
      .write.option("parquet.block.size", 65536).parquet(linearPath)
    Layout.clusterByZ(data, "x", "y", numFiles = 8)
      .write.option("parquet.block.size", 65536).parquet(zPath)

    def probe(path: String): (Long, Long) = {
      val hit = spark.read.parquet(path)
        .filter(F.col("y") >= 1000 && F.col("y") < 2000)
      val matched = hit.count()
      val read = scanRowsRead(hit.select("id", "x", "y"))
      (matched, read)
    }
    val (mLin, readLin) = probe(linearPath)
    val (mZ, readZ) = probe(zPath)

    info(s"rows read under y-predicate: linear=$readLin z-order=$readZ " +
      s"(${n} total, $mZ matching)")
    assert(mLin == mZ, s"layouts disagree on the answer: $mLin vs $mZ")
    // x-sorted layout: y is uniform in every row group -> nothing prunes
    assert(readLin > (n * 9) / 10, s"expected ~full read on linear layout, got $readLin")
    // z-clustered: only row groups whose y-box hits [1000,2000) survive
    assert(readZ < readLin / 5, s"z-order read $readZ vs linear $readLin — expected >5x pruning")
    assert(readZ < n / 6, s"z-order read $readZ of $n rows — boxes too wide")
  }

  test("q_zorder buckets are tight hyper-rectangles in both dimensions") {
    val rows = SparkEntry.queries("q_zorder")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length <= 256)
    rows.foreach { r =>
      // top-8-bit z-bucket fixes 4 high bits of each dim -> box <= 4096 wide
      assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") < 4096L)
      assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") < 4096L)
    }
  }
}
