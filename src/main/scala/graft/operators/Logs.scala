package graft.operators

import graft.sources.Configs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational-log analytics — the one data product of the reference repo
  * not yet queryable: every reference script logs through a single
  * formatter (cf. /root/reference/logging.sh:24, the `_log` function:
  * `[iceberg-daq | LOG_PREFIX | YYYY-MM-DD HH:MM:SS] LEVEL: msg`, ANSI
  * colored, WARNING/ERROR mirrored to stderr), so a captured operations
  * stream is a parseable table: which script is failing, how often, when.
  *
  * Scale shape: a line-oriented text scan (splittable, parallel by file
  * block), ANSI strip + parse via native `regexp_replace`/
  * `regexp_extract` (codegen'd, no UDF), then one two-phase aggregation
  * keyed by (script, hour) — the reduce side is bounded by
  * scripts × hours, not log volume, so 100 TB of logs is a scan-bound
  * single pass. Regexes are lookahead-free (identical semantics on Java
  * regex and DuckDB's RE2 — the CLAUDE.md oracle discipline). Malformed
  * lines (stack traces, blanks, torn lines) drop without error. The hour
  * key stays a STRING prefix of the logged naive timestamp — no timezone
  * interpretation anywhere (the q_evt_deadtime TZ lesson). */
object Logs {

  /** Committed fixture (see `graft.tools.LogGen`). */
  val LogPath = "data/logs/daq.log"

  /** ANSI SGR escape, e.g. ESC[38;5;36m. */
  private val Ansi = "\u001B\\[[0-9;]*m"

  /** One log line, after ANSI stripping: script, timestamp, level, msg. */
  private val Line = "^\\[iceberg-daq \\| ([^|\\]]+) \\| " +
    "([0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2})\\] " +
    "(INFO|WARNING|ERROR): (.*)$"

  def lines(s: SparkSession): DataFrame =
    s.read.text(Configs.absDir(LogPath))

  /** ANSI strip + parse over a `value`-columned frame of raw lines —
    * shared verbatim by the batch queries and the streaming monitor
    * (`Streams.logMonitor`): a pure narrow transform, so Structured
    * Streaming incrementalizes the SAME plan. */
  def parseLines(raw: DataFrame): DataFrame =
    raw
      .select(regexp_replace(col("value"), Ansi, "").as("line"))
      .select(
        regexp_extract(col("line"), Line, 1).as("script"),
        regexp_extract(col("line"), Line, 2).as("ts"),
        regexp_extract(col("line"), Line, 3).as("level"),
        regexp_extract(col("line"), Line, 4).as("msg"))
      .filter(col("script") =!= "") // non-conforming lines drop silently

  /** Parsed conforming lines: (script, ts string, level, msg). */
  def parsed(s: SparkSession): DataFrame = parseLines(lines(s))

  /** Error/warn rates per script per hour — the shifter's "which script
    * is failing tonight" table. Counts are exact BIGINTs; the rate is one
    * double division of those ints in the final projection
    * (engine-exact). */
  def qLogErrors(s: SparkSession, d: String): DataFrame =
    parsed(s)
      .select(col("script"), substring(col("ts"), 1, 13).as("hour"),
        col("level"))
      .groupBy(col("script"), col("hour"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("level") === "WARNING", 1).otherwise(0)).as("n_warn"),
        sum(when(col("level") === "ERROR", 1).otherwise(0)).as("n_error"))
      .select(col("script"), col("hour"), col("n_lines"), col("n_warn"),
        col("n_error"),
        (col("n_error").cast("double") / col("n_lines")).as("err_rate"))

  def qLogErrorsSql: String =
    s"""WITH raw AS (
       |  SELECT unnest(string_split(content, chr(10))) AS line0
       |  FROM read_text('${Configs.absDir(LogPath)}')
       |),
       |clean AS (
       |  SELECT regexp_replace(line0, chr(27) || '\\[[0-9;]*m', '', 'g') AS line
       |  FROM raw
       |),
       |p AS (
       |  SELECT regexp_extract(line, '$Line', 1) AS script,
       |         regexp_extract(line, '$Line', 2) AS ts,
       |         regexp_extract(line, '$Line', 3) AS level
       |  FROM clean
       |),
       |f AS (
       |  SELECT script, substr(ts, 1, 13) AS hour, level
       |  FROM p WHERE script <> ''
       |)
       |SELECT script, hour,
       |       CAST(count(*) AS BIGINT) AS n_lines,
       |       CAST(sum(CASE WHEN level = 'WARNING' THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_warn,
       |       CAST(sum(CASE WHEN level = 'ERROR' THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_error,
       |       CAST(sum(CASE WHEN level = 'ERROR' THEN 1 ELSE 0 END) AS DOUBLE)
       |         / count(*) AS err_rate
       |FROM f GROUP BY script, hour""".stripMargin

  /** Time-to-first-error per script per day — how long each day's
    * operations ran before the first ERROR (days without an ERROR are
    * absent; the min is over the raw second-of-day of the first error
    * line). String day key + integer seconds: engine-exact. */
  def qLogFirstError(s: SparkSession, d: String): DataFrame =
    parsed(s)
      .filter(col("level") === "ERROR")
      .select(col("script"), substring(col("ts"), 1, 10).as("day"),
        (substring(col("ts"), 12, 2).cast("long") * 3600
          + substring(col("ts"), 15, 2).cast("long") * 60
          + substring(col("ts"), 18, 2).cast("long")).as("sec_of_day"))
      .groupBy(col("script"), col("day"))
      .agg(min(col("sec_of_day")).as("first_error_sec"),
        count(lit(1)).as("n_errors"))

  def qLogFirstErrorSql: String =
    s"""WITH raw AS (
       |  SELECT unnest(string_split(content, chr(10))) AS line0
       |  FROM read_text('${Configs.absDir(LogPath)}')
       |),
       |clean AS (
       |  SELECT regexp_replace(line0, chr(27) || '\\[[0-9;]*m', '', 'g') AS line
       |  FROM raw
       |),
       |p AS (
       |  SELECT regexp_extract(line, '$Line', 1) AS script,
       |         regexp_extract(line, '$Line', 2) AS ts,
       |         regexp_extract(line, '$Line', 3) AS level
       |  FROM clean
       |),
       |e AS (
       |  SELECT script, substr(ts, 1, 10) AS day,
       |         CAST(substr(ts, 12, 2) AS BIGINT) * 3600
       |           + CAST(substr(ts, 15, 2) AS BIGINT) * 60
       |           + CAST(substr(ts, 18, 2) AS BIGINT) AS sec_of_day
       |  FROM p WHERE script <> '' AND level = 'ERROR'
       |)
       |SELECT script, day, min(sec_of_day) AS first_error_sec,
       |       CAST(count(*) AS BIGINT) AS n_errors
       |FROM e GROUP BY script, day""".stripMargin
}
