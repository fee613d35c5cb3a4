package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructField, StructType}

/** Host/hardware inventory as config-as-data — the last reference data
  * product with no query surface (cf. cpupin_files/cpupin-all.json and
  * cpupin_files/iceberg03-hardware.txt): CPU-pinning maps ("which thread
  * of which DAQ application is pinned to which cpu slot") and the
  * `lshw`-style hardware tree ("what CPUs/NICs/memory does this host
  * carry"), both flattened into the q_config_kv relation family so
  * pinning audits (double-booked cpus, unpinned apps) and hardware diffs
  * are plain joins.
  *
  * Scale posture: like `Configs`, CONTROL-PLANE data — KB-scale, one file
  * per host — so single-partition line windows and driver-adjacent
  * parsing are correct here (the inference/window bans are for fact
  * tables). Both parses are pure column expressions over exploded lines —
  * no UDFs; the oracle mirrors them in SQL.
  */
object Hardware {

  val CpupinPath = "data/cpupin/cpupin.json"
  val HardwarePath = "data/cpupin/hardware.txt"

  /** cpupin JSON schema — app names are MAP KEYS ("--name <app>") carrying
    * a `threads` map of thread-name → cpu-list string ("28,3,5,7"), so
    * this is an explicit-schema map load (inference would make each app a
    * struct FIELD, cf. the Dromap discipline). */
  private val cpupinSchema = StructType(Seq(StructField("daq_application",
    MapType(StringType, StructType(Seq(StructField("threads",
      MapType(StringType, StringType))))))))

  /** The pinning relation: (app, thread, pin_idx, cpu) — one row per cpu
    * slot in each thread's comma-list, pin order preserved as a 0-based
    * index. App names drop the "--name " prefix. */
  def cpupin(spark: SparkSession, path: String = CpupinPath): DataFrame =
    spark.read.schema(cpupinSchema).option("multiLine", "true")
      .json(Configs.absDir(path))
      .select(explode(col("daq_application")).as(Seq("app0", "appv")))
      .select(regexp_replace(col("app0"), "^--name ", "").as("app"),
        explode(col("appv.threads")).as(Seq("thread", "cpus")))
      .select(col("app"), col("thread"),
        posexplode(split(col("cpus"), ",")).as(Seq("pin_idx", "cpu0")))
      .select(col("app"), col("thread"), col("pin_idx"),
        col("cpu0").cast("int").as("cpu"))

  def qConfigCpupin(spark: SparkSession): DataFrame = cpupin(spark)

  /** DuckDB mirror: json_keys walk with QUOTED member paths (app keys
    * contain spaces, thread names contain dots — '$."k"' quoting keeps
    * both engines on the same members). */
  def qConfigCpupinSql: String = {
    val abs = Configs.absDir(CpupinPath)
    s"""WITH raw AS (SELECT content::JSON AS j FROM read_text('$abs')),
       |apps AS (
       |  SELECT unnest(json_keys(j, '$$.daq_application')) AS app0, j FROM raw
       |),
       |th AS (
       |  SELECT app0,
       |    unnest(json_keys(j,
       |      '$$.daq_application."' || app0 || '".threads')) AS thread, j
       |  FROM apps
       |),
       |pins AS (
       |  SELECT app0, thread,
       |    string_split(json_extract_string(j,
       |      '$$.daq_application."' || app0 || '".threads."' || thread || '"'),
       |      ',') AS cpus
       |  FROM th
       |)
       |SELECT regexp_replace(app0, '^--name ', '') AS app, thread,
       |  CAST(generate_subscripts(cpus, 1) - 1 AS INT) AS pin_idx,
       |  CAST(unnest(cpus) AS INT) AS cpu
       |FROM pins""".stripMargin
  }

  /** The lshw-style hardware tree flattened to (component, key, value):
    * `*-section` headers open a component, indented `key: value` lines
    * attach to the last opened one (pre-header lines to "system"). The
    * line order that drives the header window comes from a wholetext
    * split — deterministic, single KB-scale file (see scale posture). */
  def hardwareKv(spark: SparkSession, path: String = HardwarePath): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val HdrRe = "^\\s*\\*-([a-z0-9:]+)"
    val KvRe = "^\\s*([a-z][a-z ]*): (.*)$"
    val lines = spark.read.option("wholetext", "true")
      .text(Configs.absDir(path))
      .select(posexplode(split(col("value"), "\n")).as(Seq("ln", "line")))
    lines
      .withColumn("hdr", nullif(regexp_extract(col("line"), HdrRe, 1), lit("")))
      .withColumn("k", nullif(regexp_extract(col("line"), KvRe, 1), lit("")))
      .withColumn("v", regexp_extract(col("line"), KvRe, 2))
      .withColumn("component", coalesce(
        last(col("hdr"), ignoreNulls = true).over(Window.orderBy(col("ln"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        lit("system")))
      .filter(col("k").isNotNull)
      .select(col("component"), col("k").as("key"), trim(col("v")).as("value"))
  }

  def qConfigHw(spark: SparkSession): DataFrame = hardwareKv(spark)

  /** DuckDB mirror: same regexes (lookahead-free — Java/RE2 agree), same
    * last-header-wins window via IGNORE NULLS. */
  def qConfigHwSql: String = {
    val abs = Configs.absDir(HardwarePath)
    s"""WITH raw AS (SELECT content FROM read_text('$abs')),
       |lines AS (
       |  SELECT unnest(string_split(content, chr(10))) AS line,
       |         generate_subscripts(string_split(content, chr(10)), 1) AS ln
       |  FROM raw
       |),
       |marked AS (
       |  SELECT ln,
       |    nullif(regexp_extract(line, '^\\s*\\*-([a-z0-9:]+)', 1), '') AS hdr,
       |    nullif(regexp_extract(line, '^\\s*([a-z][a-z ]*): (.*)$$', 1), '') AS k,
       |    regexp_extract(line, '^\\s*([a-z][a-z ]*): (.*)$$', 2) AS v
       |  FROM lines
       |)
       |SELECT coalesce(last_value(hdr IGNORE NULLS) OVER (
       |    ORDER BY ln ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    'system') AS component,
       |  k AS key, trim(v) AS value
       |FROM marked
       |QUALIFY k IS NOT NULL""".stripMargin
  }
}
