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

  // ------------------------------------------------- authoritative runs dim

  /** Repo-relative default path of the run-control records fixture. */
  val DefaultRunsPath = "data/runs/runs.jsonl"

  import org.apache.spark.sql.types._

  /** Explicit schema for run-control records (one JSON object per line —
    * the run-control emit shape, cf. run/run_iceberg_daq.sh:20-35 which
    * stamps each acquisition with run number, config and duration). */
  val runRecordSchema: StructType = StructType(Seq(
    StructField("run_number", LongType, nullable = false),
    StructField("config_name", StringType, nullable = false),
    StructField("purpose", StringType),
    StructField("start_ts", TimestampType, nullable = false),
    StructField("stop_ts", TimestampType, nullable = false)))

  /** The AUTHORITATIVE runs dimension, ingested from run-control records
    * rather than derived from event time — the production path (the 8 h
    * bucketing above stays as the fallback when no run control exists).
    * KB-scale control-plane data: explicit schema, broadcast into every
    * fact join. */
  def authoritativeRuns(s: SparkSession, path: String = DefaultRunsPath): DataFrame =
    s.read.schema(runRecordSchema)
      .json(graft.sources.Configs.absDir(path))

  /** Events stamped with their authoritative run via time-range join
    * against the broadcast dim; [start_ts, stop_ts) — events in inter-run
    * gaps carry no run and are dropped (inner) by design. */
  def eventsWithAuthRun(ev: DataFrame, runsDim: DataFrame): DataFrame =
    ev.join(broadcast(runsDim),
      ev("ts") >= runsDim("start_ts") && ev("ts") < runsDim("stop_ts"))

  /** Per-run event summary over the AUTHORITATIVE dim — q_run_summary's
    * production twin: the run boundaries come from run control (including
    * gaps and short calibration runs), not from event-time buckets. */
  def qRunsAuth(s: SparkSession, d: String): DataFrame =
    eventsWithAuthRun(Events.events(s, d), authoritativeRuns(s))
      .groupBy(col("run_number"), col("config_name"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(12,4)")).cast("double").as("sum_value"))

  def qRunsAuthSql: String = {
    val p = graft.sources.Configs.absDir(DefaultRunsPath)
    s"""WITH r AS (SELECT run_number, config_name,
       |  CAST(start_ts AS TIMESTAMP) AS start_ts, CAST(stop_ts AS TIMESTAMP) AS stop_ts
       |  FROM read_json_auto('$p'))
       |SELECT r.run_number, r.config_name, count(*) AS n_events,
       |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       |  CAST(sum(CAST(e.value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
       |FROM events e JOIN r ON e.ts >= r.start_ts AND e.ts < r.stop_ts
       |GROUP BY r.run_number, r.config_name""".stripMargin
  }

  /** "What changed between run N and the run before it": consecutive runs
    * whose configs differ, exploded to the key level through the
    * config-as-data relation (graft.sources.Configs.kv). Output one row per
    * differing key: (run_number, prev_run, key, value, prev_value, change).
    * Both inputs are KB-scale control-plane dims — the single-partition
    * window over the runs dim is deliberate. */
  def qRunConfigDiff(s: SparkSession): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("run_number"))
    val pairs = authoritativeRuns(s)
      .select(col("run_number"), col("config_name"))
      .withColumn("prev_run", lag(col("run_number"), 1).over(w))
      .withColumn("prev_config", lag(col("config_name"), 1).over(w))
      .filter(col("prev_config").isNotNull && col("prev_config") =!= col("config_name"))
    val k = graft.sources.Configs.kv(s)
    val cur = pairs.join(k, k("config_name") === pairs("config_name"))
      .select(col("run_number"), col("prev_run"), col("key"), col("value"))
    val prev = pairs.join(k, k("config_name") === pairs("prev_config"))
      .select(col("run_number"), col("prev_run"), col("key"),
        col("value").as("prev_value"))
    cur.join(prev, Seq("run_number", "prev_run", "key"), "full_outer")
      .filter(col("value").isNull || col("prev_value").isNull
        || col("value") =!= col("prev_value"))
      .select(col("run_number"), col("prev_run"), col("key"),
        col("value"), col("prev_value"),
        when(col("value").isNull, lit("removed"))
          .when(col("prev_value").isNull, lit("added"))
          .otherwise(lit("changed")).as("change"))
  }

  def qRunConfigDiffSql: String = {
    val p = graft.sources.Configs.absDir(DefaultRunsPath)
    graft.sources.Configs.kvSql() +
      s"""
         |, runs AS (SELECT run_number, config_name FROM read_json_auto('$p')),
         |seq AS (SELECT run_number, config_name,
         |  lag(run_number) OVER (ORDER BY run_number) AS prev_run,
         |  lag(config_name) OVER (ORDER BY run_number) AS prev_config FROM runs),
         |pairs AS (SELECT * FROM seq
         |  WHERE prev_config IS NOT NULL AND prev_config <> config_name),
         |cur AS (SELECT p.run_number, p.prev_run, k.key, k.value
         |  FROM pairs p JOIN kv k ON k.config_name = p.config_name),
         |prev AS (SELECT p.run_number, p.prev_run, k.key, k.value AS prev_value
         |  FROM pairs p JOIN kv k ON k.config_name = p.prev_config)
         |SELECT coalesce(c.run_number, v.run_number) AS run_number,
         |  coalesce(c.prev_run, v.prev_run) AS prev_run,
         |  coalesce(c.key, v.key) AS key, c.value, v.prev_value,
         |  CASE WHEN c.value IS NULL THEN 'removed'
         |       WHEN v.prev_value IS NULL THEN 'added'
         |       ELSE 'changed' END AS change
         |FROM cur c FULL OUTER JOIN prev v
         |  ON c.run_number = v.run_number AND c.prev_run = v.prev_run
         | AND c.key = v.key
         |WHERE c.value IS NULL OR v.prev_value IS NULL OR c.value <> v.prev_value""".stripMargin
  }

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
