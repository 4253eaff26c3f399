package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Generic bounded per-group top-k — the scale-safe replacement for the
  * `row_number() OVER (PARTITION BY ... ORDER BY ...) <= k` idiom. The
  * window form shuffle-sorts EVERY row of every group; here each map
  * task reduces its slice to a k-element sketch per group BEFORE the
  * shuffle (the `topk_pairs` TypedImperativeAggregate), so the exchange
  * carries at most groups x k entries regardless of group sizes — the
  * same bounded-aggregate shape that carries the ANN and stratified
  * sampling operators.
  */
object TopN {

  /** Top `k` rows per group by (`scoreCol` desc, `idCol` asc — the
    * deterministic tie-break). Output: groupCols ++ (idCol, scoreCol,
    * rank), rank 1-based in sketch order.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(k > 0, "k must be positive")
    // fail fast on shapes the sketch cannot rank: a lossy/failed cast
    // would silently DROP rows (null score/id never enters the buffer),
    // diverging from the window idiom this replaces
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"topKPerGroup id column '$idCol' must be integral, got ${other.catalogString}")
    }
    df.schema(scoreCol).dataType match {
      case _: NumericType => ()
      case other => throw new IllegalArgumentException(
        s"topKPerGroup score column '$scoreCol' must be numeric, got ${other.catalogString}")
    }
    graft.GraftFunctions.register(df.sparkSession)
    df.groupBy(groupCols.map(F.col): _*)
      .agg(graft.functions.TopK.topkPairs(
        F.col(scoreCol).cast("double"), F.col(idCol).cast("long"), k).as("__top"))
      .select(groupCols.map(F.col) :+
        F.posexplode(F.col("__top")).as(Seq("__pos", "__p")): _*)
      .select(groupCols.map(F.col) :+
        F.col("__p.id").as(idCol) :+
        F.col("__p.score").as(scoreCol) :+
        (F.col("__pos") + 1).cast("long").as("rank"): _*)
  }
}
