package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.B — run lifecycle: the reference's unit of work is the RUN (number,
  * config name, duration — cf. /root/reference/run/run_iceberg_daq.sh:20-35,
  * which stamps each acquisition with a run number and config). A DAQ
  * analyst's first query is per-run, and the run is the natural
  * incremental-ingest and partition boundary.
  *
  * In production the run dimension is ingested from run control; here it is
  * DERIVED deterministically from event time (fixed 8-hour acquisition
  * windows) so the whole chain is DuckDB-oracle-checkable. The config name
  * cycles over 4 base configs, the create_daq_config.sh synthesis pattern.
  */
object Runs {

  /** Run length: 8-hour acquisition windows. */
  val RunSeconds = 28800

  /** Deterministic run number from event time (epoch-aligned 8 h buckets).
    * At 100 TB this is the partition column for every DAQ-shaped table:
    * per-run queries prune at the directory level. */
  def runNumber(ts: Column): Column =
    floor(unix_timestamp(ts) / RunSeconds).cast("bigint")

  /** The runs dimension: (run_number, config_name, run_start, run_stop).
    * Broadcast-sized relative to events (one row per 8 h). */
  def runs(s: SparkSession, d: String): DataFrame =
    Events.events(s, d)
      .groupBy(runNumber(col("ts")).as("run_number"))
      .agg(min(col("ts")).as("run_start"), max(col("ts")).as("run_stop"))
      .withColumn("config_name",
        concat(lit("iceberg_daq_v"), pmod(col("run_number"), lit(4)).cast("string")))

  /** Per-run summary — counts, duration, integrity: the "events for run N
    * between start/stop" report. The events fact shuffles once on
    * run_number; the runs dim rides along broadcast (it is KB-scale by
    * construction — one row per 8 h window). */
  def qRunSummary(s: SparkSession, d: String): DataFrame = {
    val ev = Events.events(s, d)
      .withColumn("run_number", runNumber(col("ts")))
    val perRun = ev.groupBy(col("run_number"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("n_dup_events"),
        sum(col("value").cast("decimal(12,4)")).cast("double").as("sum_value"))
    perRun.join(broadcast(runs(s, d)), "run_number")
      .select(col("run_number"), col("config_name"),
        col("run_start"), col("run_stop"),
        (unix_micros(col("run_stop")) - unix_micros(col("run_start"))).as("duration_us"),
        col("n_events"), col("n_users"), col("n_dup_events"), col("sum_value"))
  }

  def qRunSummarySql: String =
    """WITH ev AS (SELECT *, CAST(floor(epoch(ts) / 28800) AS BIGINT) AS run_number FROM events),
      |runs AS (SELECT run_number, min(ts) AS run_start, max(ts) AS run_stop,
      |  'iceberg_daq_v' || CAST(run_number % 4 AS VARCHAR) AS config_name
      |  FROM ev GROUP BY run_number),
      |summary AS (SELECT run_number, count(*) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS n_dup_events,
      |  CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
      |  FROM ev GROUP BY run_number)
      |SELECT s.run_number, r.config_name, r.run_start, r.run_stop,
      | epoch_us(r.run_stop) - epoch_us(r.run_start) AS duration_us,
      | s.n_events, s.n_users, s.n_dup_events, s.sum_value
      |FROM summary s JOIN runs r ON s.run_number = r.run_number""".stripMargin

  /** Events written partitioned by run_number — the 100 TB pruning story
    * for DAQ-shaped tables: a per-run predicate prunes whole directories
    * before any file is opened (asserted in RunsSpec via PartitionFilters). */
  def writeEventsByRun(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("run_number", runNumber(col("ts")))
      .repartition(col("run_number")) // one task-set per partition dir
      .write
      .partitionBy("run_number")
      .mode("overwrite")
      .parquet(outDir)
}
