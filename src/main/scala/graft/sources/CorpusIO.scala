package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Corpus interchange I/O: JSON-Lines shards, the de-facto exchange
  * format of training-data pipelines (one JSON document per line,
  * gzip-compressed shards a downstream loader can stream
  * independently).
  *
  * Parquet remains the engine's working format (columnar pruning,
  * predicate pushdown); JSONL is the EDGE format — what leaves the
  * pipeline for tokenizer/loader consumption and what arrives from
  * third-party corpora. Schema-first reads, like every other source
  * here: JSON carries no schema, and inference at 100 TB is a full
  * extra pass over the data.
  */
object CorpusIO {

  /** Write JSONL shards. `shards > 0` bounds the output file count (a
    * round-robin repartition — downstream loaders usually want a fixed
    * shard fan-out); 0 keeps the upstream partitioning.
    */
  def writeJsonl(
      df: DataFrame,
      dir: String,
      shards: Int = 0,
      compress: Boolean = true): Unit = {
    val sized = if (shards > 0) df.repartition(shards) else df
    sized.write.mode(SaveMode.Overwrite)
      .option("compression", if (compress) "gzip" else "none")
      .json(dir)
  }

  /** Schema-first JSONL read; rows that fail to parse surface in the
    * standard `_corrupt_record`-free PERMISSIVE way (null columns), so
    * a malformed third-party line never kills a 100 TB ingest.
    */
  def readJsonl(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)

  /** ORC interchange — the OTHER columnar format corpora arrive in
    * (Hive-lineage pipelines). Same bounded-shard contract as
    * [[writeJsonl]]; ORC carries its own schema and supports the same
    * predicate-pushdown/column-pruning the engine relies on for
    * parquet, so an ORC-sourced corpus scans just as prunably.
    */
  def writeOrc(df: DataFrame, dir: String, shards: Int = 0): Unit = {
    val sized = if (shards > 0) df.repartition(shards) else df
    sized.write.mode(SaveMode.Overwrite).orc(dir)
  }

  /** Schema-first ORC read: the stored schema is not trusted blindly —
    * pinning the expected schema keeps third-party drops from silently
    * widening/renaming columns mid-ingest.
    */
  def readOrc(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)
}
