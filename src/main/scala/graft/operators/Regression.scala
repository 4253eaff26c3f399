package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.types._

/** Distributed least-squares fitting via normal equations — the
  * "calibrate a cheap pre-filter" op of a training-data pipeline: fit a
  * linear model from inexpensive integer document features (token,
  * punctuation, stopword counts) so the fitted weights can screen
  * documents BEFORE expensive model scoring.
  *
  * Scale shape: the classic single-sketch fit. One map-side-combined
  * aggregate reduces the whole corpus to a per-group k(k+1)/2 + k
  * moment sketch (here k = 3: two features + intercept → 9 BIGINTs per
  * group); the driver solves the 3×3 system EXACTLY in BigInt by
  * Cramer's rule (no floating point, no iteration, model-sized math
  * only — the kCenter/kmeans collect contract); a second map-side pass
  * scores the residual against the milli-truncated weights. Nothing
  * corpus-sized moves: the sketch is |groups|×9, the weight frame
  * broadcasts back at |groups|×4.
  *
  * Determinism: every intermediate is an exact integer — the sums are
  * BIGINT, the Cramer determinants are BigInt, and the emitted weights
  * are milli-scaled truncating divisions (toward zero, matching DuckDB
  * `//` on HUGEINT) — so an independent engine reproduces the fit
  * bit-for-bit, degenerate (det = 0) groups emitting NULL weights.
  */
object Regression {

  /** Ordinary least squares of `y ≈ b1·x1 + b2·x2 + b0` per group (the
    * group column must be string-typed; feature/target columns must be
    * integer-valued). Output per group: n, the three milli-scaled
    * weights, and the L1 residual of the milli-truncated fit
    * (Σ|1000·y − (b1ₘ·x1 + b2ₘ·x2 + b0ₘ)|) — the fit AND the proof it
    * fits, in one frame.
    */
  /** The pure exact-integer Cramer solve of the 3×3 normal system,
    * factored out for property-level checks. Input is the 9-element
    * moment sketch `(s11, s12, s1, s22, s2, n, s1y, s2y, sy)`; output
    * is the milli-truncated `(b1, b2, b0)` (division toward zero,
    * matching DuckDB HUGEINT `//`), or None when the system is
    * singular.
    */
  def solve3(v: Seq[BigInt]): Option[Seq[BigInt]] = {
    val Seq(s11, s12, s1, s22, s2, n, s1y, s2y, sy) = v
    // Cramer over A = [[s11,s12,s1],[s12,s22,s2],[s1,s2,n]], rhs =
    // [s1y,s2y,sy]; detJ replaces column J with the rhs
    val det = s11 * (s22 * n - s2 * s2) - s12 * (s12 * n - s2 * s1) +
      s1 * (s12 * s2 - s22 * s1)
    val d1 = s1y * (s22 * n - s2 * s2) - s12 * (s2y * n - s2 * sy) +
      s1 * (s2y * s2 - s22 * sy)
    val d2 = s11 * (s2y * n - s2 * sy) - s1y * (s12 * n - s2 * s1) +
      s1 * (s12 * sy - s2y * s1)
    val d0 = s11 * (s22 * sy - s2y * s2) - s12 * (s12 * sy - s2y * s1) +
      s1y * (s12 * s2 - s22 * s1)
    if (det == 0) None
    else Some(Seq(d1, d2, d0).map(dj => (dj * 1000) / det))
  }

  /** Build the 9-element moment sketch of [[solve3]] from raw
    * (x1, x2, y) triples — the driver-side twin of the distributed
    * aggregate, for tests and property checks.
    */
  def sketch(rows: Seq[(Long, Long, Long)]): Seq[BigInt] = {
    def s(f: ((Long, Long, Long)) => BigInt) = rows.map(f).sum
    Seq(
      s(r => BigInt(r._1) * r._1), s(r => BigInt(r._1) * r._2),
      s(r => BigInt(r._1)), s(r => BigInt(r._2) * r._2),
      s(r => BigInt(r._2)), BigInt(rows.size),
      s(r => BigInt(r._1) * r._3), s(r => BigInt(r._2) * r._3),
      s(r => BigInt(r._3)))
  }

  /** The (g, x1, x2, y) feature frame both passes consume — map-only,
    * so it composes with batch AND streaming inputs unchanged. */
  def features(
      df: DataFrame,
      groupCol: String,
      x1: Column,
      x2: Column,
      y: Column): DataFrame =
    df.select(F.col(groupCol).as("g"),
      x1.cast(LongType).as("x1"), x2.cast(LongType).as("x2"),
      y.cast(LongType).as("y"))

  /** The per-group moment-sketch aggregation — the ONLY corpus-touching
    * reduction of the fit, and (being plain sums) additively mergeable:
    * it runs identically as a batch aggregate or as an update-mode
    * streaming aggregate whose state is |groups| × 9 BIGINTs.
    */
  def sketchAgg(f: DataFrame): DataFrame =
    f.groupBy("g").agg(
      F.sum(F.col("x1") * F.col("x1")).as("s11"),
      F.sum(F.col("x1") * F.col("x2")).as("s12"),
      F.sum(F.col("x1")).as("s1"),
      F.sum(F.col("x2") * F.col("x2")).as("s22"),
      F.sum(F.col("x2")).as("s2"),
      F.count(F.lit(1)).as("n"),
      F.sum(F.col("x1") * F.col("y")).as("s1y"),
      F.sum(F.col("x2") * F.col("y")).as("s2y"),
      F.sum(F.col("y")).as("sy"))

  /** Solve each group's collected sketch and score the residual against
    * the feature frame `f`: the serve-time tail shared by the batch fit
    * and the streaming-accumulated fit.
    */
  def fitFromSketch(
      sketches: Seq[(String, Seq[BigInt])],
      f: DataFrame): DataFrame = {
    val s = f.sparkSession
    val rows = sketches.map { case (g, v) =>
      // a near-singular (det ≈ 0 but nonzero) group can blow a milli
      // weight past Long range; BigInt.toLong would silently keep the
      // low 64 bits and emit a wrong fit, so out-of-range groups emit
      // NULL weights like singular ones (the oracle's CAST AS BIGINT
      // would error loudly there — NULL keeps the engine on the
      // fail-visible side of that divergence)
      val beta = solve3(v).filter(_.forall(_.isValidLong))
      def cell(i: Int): Any = beta.map(_(i).toLong).orNull
      Row(g, v(5).toLong, cell(0), cell(1), cell(2))
    }
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("n", LongType),
      StructField("b1_milli", LongType), StructField("b2_milli", LongType),
      StructField("b0_milli", LongType)))
    val bdf = s.createDataFrame(
      s.sparkContext.parallelize(rows, 1), schema)
    // residual pass: milli-truncated prediction against 1000·y, map-side
    // partial-agged; the weights ride as a broadcast |groups|×4 frame
    val err = f.join(F.broadcast(bdf), Seq("g"))
      .groupBy("g")
      .agg(F.sum(F.abs(F.col("y") * 1000L -
        (F.col("b1_milli") * F.col("x1") + F.col("b2_milli") * F.col("x2") +
          F.col("b0_milli")))).as("abs_err_milli"))
    bdf.join(err, Seq("g"))
      .select(F.col("g"), F.col("n"), F.col("b1_milli"),
        F.col("b2_milli"), F.col("b0_milli"), F.col("abs_err_milli"))
  }

  /** `ridge` adds an exact-integer L2 penalty to the two FEATURE
    * diagonal entries of the normal matrix (the intercept stays
    * unpenalized, standard ridge practice): `A' = A + diag(λ, λ, 0)`.
    * With near-collinear features — this corpus's token and char counts
    * correlate at 0.997 — plain OLS weights are large and
    * opposite-signed; the penalty shrinks them while every intermediate
    * stays an exact integer, so the regularized fit is as replayable as
    * the plain one. λ = 0 is exact OLS.
    */
  def olsFit2(
      df: DataFrame,
      groupCol: String,
      x1: Column,
      x2: Column,
      y: Column,
      ridge: Long = 0L): DataFrame = {
    val f = features(df, groupCol, x1, x2, y)
    // the per-group moment sketch: |groups| rows × 9 BIGINTs — the only
    // thing the fit ever collects
    val sk = sketchAgg(f).collect().toSeq
      .map { r =>
        val v = (1 to 9).map(i => BigInt(r.getLong(i)))
        r.getString(0) -> v.updated(0, v(0) + ridge).updated(3, v(3) + ridge)
      }
    fitFromSketch(sk, f)
  }
}
