package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's scale-tuned defaults and the native
  * function extensions pre-registered.
  *
  * Defaults are chosen for the 100 TB posture and scale DOWN fine:
  *  - AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  *    broadcast demotion/promotion from real stats);
  *  - shuffle partitions sized from parallelism (caller overrides for a
  *    real cluster: ~2-3× total executor cores);
  *  - 64 MB broadcast threshold — every dim in this schema broadcasts,
  *    fact-fact joins still shuffle;
  *  - UTC session timezone (engine-parity for timestamp semantics).
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS), which the parquet reader
      // rejects by default; read as epoch-nanos longs (session-wide, set at
      // construction — not mutated inside table loaders)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session for tools/tests. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).config("spark.ui.enabled", "false").getOrCreate()
}
