package graft

import java.nio.file.Files
import org.apache.spark.sql.{functions => F}

/** The driver has regenerated /root/testdata with a different events.ts
  * physical type between rounds (raw int64 nanos through round 10,
  * native micros timestamps from round 11). The catalog's adaptive
  * events read must produce IDENTICAL query results over every layout a
  * generator might emit: epoch-nano longs, TIMESTAMP_NTZ micros, and
  * TIMESTAMP (LTZ) micros. This spec pins that — a future regeneration
  * flips a layout, not the round's correctness column.
  */
class SchemaDriftSpec extends SparkSpec {

  /** One synthetic events table written in three ts layouts; every other
    * column identical. 1000 events / 20 users over ~3 hours.
    */
  private lazy val dirs: (String, String, String) = {
    import spark.implicits._
    val base = spark.range(1000).select(
      F.col("id").as("event_id"),
      (F.lit(1704100000000000L) + F.col("id") * 11000000L).as("us"), // micros
      F.pmod(F.col("id") * 7L, F.lit(20)).as("user_id"),
      F.concat(F.lit("t"), F.pmod(F.col("id"), F.lit(4))).as("event_type"),
      (F.pmod(F.col("id") * 13L, F.lit(1000)) / F.lit(10.0)).as("value"),
      F.lit("""{"k": 1}""").as("props"))
    def write(dir: String, ts: org.apache.spark.sql.Column): String = {
      base.select(F.col("event_id"), ts.as("ts"), F.col("user_id"),
        F.col("event_type"), F.col("value"), F.col("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val root = Files.createTempDirectory("graft-drift").toString
    (
      write(s"$root/nanos", (F.col("us") * 1000L).cast("long")),
      write(s"$root/ntz", F.timestamp_micros(F.col("us")).cast("timestamp_ntz")),
      write(s"$root/ltz", F.timestamp_micros(F.col("us")))
    )
  }

  private def panel(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).toSeq.sorted

  test("q_topk_users is layout-invariant across nanos/ntz/ltz ts") {
    val (nanos, ntz, ltz) = dirs
    val a = panel("q_topk_users", nanos)
    assert(a === panel("q_topk_users", ntz))
    assert(a === panel("q_topk_users", ltz))
    assert(a.nonEmpty)
  }

  test("q_sessionize (unix_micros + windows over ts) is layout-invariant") {
    val (nanos, ntz, ltz) = dirs
    val a = panel("q_sessionize", nanos)
    assert(a === panel("q_sessionize", ntz))
    assert(a === panel("q_sessionize", ltz))
    assert(a.nonEmpty)
  }

  test("q_tumbling (event-time windows) is layout-invariant") {
    val (nanos, ntz, ltz) = dirs
    val a = panel("q_tumbling", nanos)
    assert(a === panel("q_tumbling", ntz))
    assert(a === panel("q_tumbling", ltz))
    assert(a.nonEmpty)
  }
}
