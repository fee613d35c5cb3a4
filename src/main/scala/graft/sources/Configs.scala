package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Config-as-data: run-control configuration JSONs loaded as a queryable
  * (config_name, key, value) relation (cf. the reference's
  * config/create_daq_config.sh:1-279 + config_helpers.sh, which synthesize
  * per-run configs by applying key overrides over base JSONs — the lake
  * queries that workflow needs are "which keys differ between these two
  * configs", "which runs used override X", neither of which the raw nested
  * JSON answers directly).
  *
  * Scale posture: configs are CONTROL-PLANE data — KB-scale, one file per
  * config — so schema inference over the directory and a broadcast of the
  * kv relation into run-dimension joins are the right calls (the inference
  * ban is for 100 TB fact tables, where one malformed file silently mutates
  * the schema; here the whole input fits in the driver). The flatten is
  * schema-driven at plan time: one generated `explode(array(struct...))`
  * projection per leaf path — no UDF, no recursion at row time.
  */
object Configs {

  /** Repo-relative default config dir (fixtures shaped after the
    * reference's base/generated layout). */
  val DefaultDir = "data/configs"

  /** Resolve a repo-relative fixture path: prefer the cwd-relative form
    * (sbt runs from the repo root), fall back to the repo anchor so the
    * queries and their generated oracle SQL survive a different cwd. */
  def absDir(dir: String): String = {
    val f = new java.io.File(dir)
    (if (f.exists()) f else new java.io.File("/root/repo", dir)).getAbsolutePath
  }

  /** Raw nested load: one row per config file + config_name column. */
  def load(spark: SparkSession, dir: String = DefaultDir): DataFrame =
    spark.read.option("multiLine", "true").json(absDir(dir))
      .withColumn("config_name",
        regexp_extract(input_file_name(), "([^/]+)\\.json$", 1))

  /** All scalar/array leaf paths of a schema as (dotted-path, column):
    * structs recurse, arrays serialize to canonical JSON text, scalars cast
    * to string — the string forms DuckDB's json_extract_string produces,
    * so the relation is cross-engine comparable. */
  private def leafCols(dt: DataType, path: Seq[String]): Seq[(String, Column)] = {
    def ref = col(path.map(p => s"`$p`").mkString("."))
    dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f => leafCols(f.dataType, path :+ f.name))
      case _: ArrayType => Seq((path.mkString("."), to_json(ref)))
      case _            => Seq((path.mkString("."), ref.cast("string")))
    }
  }

  /** The flattened config relation: (config_name, key, value), one row per
    * scalar/array leaf present in each file. Keys a file does not set are
    * absent (not null) — override semantics fall out of plain joins.
    * Explicit JSON `null` leaves are treated as ABSENT on both engines (the
    * isNotNull filter here; json_type <> 'NULL' in kvSql). Array elements
    * must be SCALARS: Spark's to_json serializes array-of-object elements
    * with inferred alphabetized field order while DuckDB keeps source key
    * order, so object-valued arrays would diverge cross-engine. */
  def kv(spark: SparkSession, dir: String = DefaultDir): DataFrame = {
    val raw = load(spark, dir)
    val leaves = raw.schema.fields.toSeq
      .filter(_.name != "config_name")
      .flatMap(f => leafCols(f.dataType, Seq(f.name)))
      .sortBy(_._1)
    raw.select(col("config_name"),
        explode(array(leaves.map { case (p, c) =>
          struct(lit(p).as("key"), c.as("value"))
        }: _*)).as("kv"))
      .select(col("config_name"), col("kv.key").as("key"), col("kv.value").as("value"))
      .filter(col("value").isNotNull)
  }

  /** DuckDB mirror of kv(): recursive descent over json_keys from the raw
    * file text (read_text: the files are multi-line pretty-printed JSON). */
  def kvSql(dir: String = DefaultDir): String =
    s"""WITH RECURSIVE raw AS (
       |  SELECT regexp_extract(filename, '([^/]+)\\.json$$', 1) AS config_name,
       |         content::JSON AS j
       |  FROM read_text('${absDir(dir)}/*.json')
       |),
       |walk(config_name, path, j) AS (
       |  SELECT config_name, '', j FROM raw
       |  UNION ALL
       |  SELECT w.config_name,
       |         CASE WHEN w.path = '' THEN k ELSE w.path || '.' || k END,
       |         json_extract(w.j, '$$.' || k)
       |  FROM walk w, unnest(json_keys(w.j)) AS t(k)
       |  WHERE json_type(w.j) = 'OBJECT'
       |),
       |kv AS (
       |  SELECT config_name, path AS key, json_extract_string(j, '$$') AS value
       |  FROM walk WHERE json_type(j) NOT IN ('OBJECT', 'NULL')
       |)""".stripMargin

  /** The whole kv relation as a driver query (oracle: kvSql). */
  def qConfigKv(spark: SparkSession): DataFrame = kv(spark)

  def qConfigKvSql: String = kvSql() + "\nSELECT config_name, key, value FROM kv"

  /** Key-level diff of two configs — the create_daq_config.sh question
    * "what did this generated config change vs its base". change ∈
    * {changed, only_a, only_b}; unchanged keys are omitted. */
  def configDiff(spark: SparkSession, nameA: String, nameB: String,
                 dir: String = DefaultDir): DataFrame = {
    val k = kv(spark, dir)
    val a = k.filter(col("config_name") === nameA)
      .select(col("key"), col("value").as("val_a"))
    val b = k.filter(col("config_name") === nameB)
      .select(col("key"), col("value").as("val_b"))
    a.join(b, Seq("key"), "full_outer")
      .filter(col("val_a").isNull || col("val_b").isNull
        || col("val_a") =!= col("val_b"))
      .select(col("key"), col("val_a"), col("val_b"),
        when(col("val_a").isNull, lit("only_b"))
          .when(col("val_b").isNull, lit("only_a"))
          .otherwise(lit("changed")).as("change"))
  }

  /** Driver query: base_cosmic vs its generated override set. */
  def qConfigDiff(spark: SparkSession): DataFrame =
    configDiff(spark, "base_cosmic", "gen_cosmic_run1")

  def qConfigDiffSql: String = kvSql() +
    """
      |, a AS (SELECT key, value AS val_a FROM kv WHERE config_name = 'base_cosmic'),
      |b AS (SELECT key, value AS val_b FROM kv WHERE config_name = 'gen_cosmic_run1')
      |SELECT coalesce(a.key, b.key) AS key, a.val_a, b.val_b,
      |  CASE WHEN a.val_a IS NULL THEN 'only_b'
      |       WHEN b.val_b IS NULL THEN 'only_a'
      |       ELSE 'changed' END AS change
      |FROM a FULL OUTER JOIN b ON a.key = b.key
      |WHERE a.val_a IS NULL OR b.val_b IS NULL OR a.val_a <> b.val_b""".stripMargin
}
