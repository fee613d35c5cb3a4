package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Detector-readout-map (dromap) JSON source — the reference's geometry
  * config (cf. /root/reference/config/base/dromaps/iceberg_dromap_wib_101.json:
  * a JSON array of {src_id, geo_id{det_id,crate_id,slot_id,stream_id}, kind,
  * parameters{...}}). Loaded through Spark's JSON source with an explicit
  * nested schema (never schema inference in production — one malformed file
  * would silently change the schema) and flattened into the broadcast-ready
  * dim table every event stream joins against.
  */
object Dromap {

  import org.apache.spark.sql.types._

  /** Explicit schema for dromap files (structure mirrors the reference's
    * format; parameters kept as a loose string map). */
  val schema: StructType = StructType(Seq(
    StructField("src_id", IntegerType, nullable = false),
    StructField("geo_id", StructType(Seq(
      StructField("det_id", IntegerType),
      StructField("crate_id", IntegerType),
      StructField("slot_id", IntegerType),
      StructField("stream_id", IntegerType))), nullable = false),
    StructField("kind", StringType),
    StructField("parameters", MapType(StringType, StringType))))

  /** Load one or more dromap JSON files (JSON-array layout → multiLine). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("multiLine", "true")
      .json(path)

  /** Flattened broadcast-ready dim: one row per source with geo columns. */
  def flat(spark: SparkSession, path: String): DataFrame =
    load(spark, path)
      .select(col("src_id"),
        col("geo_id.det_id").as("det_id"),
        col("geo_id.crate_id").as("crate_id"),
        col("geo_id.slot_id").as("slot_id"),
        col("geo_id.stream_id").as("stream_id"),
        col("kind"),
        col("parameters"))

  /** Validation the config pipeline runs before accepting a map
    * (cf. create_daq_config.sh's generation checks): unique src_ids,
    * unique (crate,slot,stream) coordinates, known kinds. Returns a
    * DataFrame of violation messages (empty = valid). */
  def validate(spark: SparkSession, path: String): DataFrame = {
    val f = flat(spark, path)
    val dupSrc = f.groupBy(col("src_id")).count().filter(col("count") > 1)
      .select(concat(lit("duplicate src_id "), col("src_id")).as("violation"))
    val dupGeo = f.groupBy(col("crate_id"), col("slot_id"), col("stream_id"))
      .count().filter(col("count") > 1)
      .select(concat(lit("duplicate geo "), col("crate_id"), lit("/"),
        col("slot_id"), lit("/"), col("stream_id")).as("violation"))
    val badKind = f.filter(!col("kind").isin("eth", "flx"))
      .select(concat(lit("unknown kind "), col("kind"),
        lit(" for src "), col("src_id")).as("violation"))
    dupSrc.union(dupGeo).union(badKind)
  }
}
