package graft

import org.apache.spark.sql.SparkSession

/** Session factory encoding the engine's scale posture in one place.
  *
  * The same builder serves local[N] testing and a real cluster — only
  * master/memory change; the SQL-level posture (AQE with skew-join
  * splitting and partition coalescing, UTC determinism, shuffle
  * partitions sized to cores not the 200 default, bounded file
  * partitions, nanos-tolerant parquet reads) is the part that must hold
  * at 100 TB and is therefore centralized here.
  */
object GraftSession {

  def builder(appName: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Reference cast semantics (SURVEY.md §7.4): text casts yield NULL on
      // malformed input (Spark 4 defaults ANSI on, which throws instead).
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Pin the v1 file output committer: job commit renames task
      // output into the destination only at commitJob, so a SINGLE-FILE
      // append job is an atomic all-or-nothing commit — the property
      // the append-only (non-op-log) streaming writers rely on for
      // replay idempotence. v2 commits per-task directly into the
      // destination, making partially-visible appends normal; never
      // run this engine with it.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "1")
      // Use the serialized sort shuffle writer at EVERY reducer count
      // (default: reducer counts <= 200 take the bypass-merge writer,
      // which opens one stream per reducer per map task). The 100 TB
      // posture already runs the sort writer (real shuffles exceed 200
      // reducers); aligning small-R shuffles to it removes the
      // per-reducer stream overhead that dominated the micro-volume
      // stages here — measured at sf0.1: q_span_remove's summed task
      // CPU 28.6 s -> 8.2 s (3.5x), q_dup_runs_char_hashed 17.7 -> 8.0 s,
      // at identical results (a writer choice, not a plan change).
      // Env-overridable for deployments whose disks prefer the
      // hash-style writer at genuinely small reducer counts.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "1"))
      // Partition discovery of the bucketed index tables (64 hive dirs)
      // trips the default 32-path threshold and runs a DISTRIBUTED
      // listing job (~0.2 s of scheduler fixed cost) for what is a
      // handful of driver-side metadata calls; several such reads run
      // per index op. Driver-side listing stays the right call well
      // into the hundreds of directories on HDFS-like and local stores;
      // deployments on slow object stores can lower it back via env.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "512"))

  /** Local session for tests/benchmarks. */
  def local(appName: String, cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(appName, cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }
}
