package graft.operators

import graft.functions.{GraftFunctions, WibFrame}
import graft.sources.{Configs, Dromap}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Waveform-sample analytics over raw WIB frames — the reference's actual
  * data product (cf. /root/reference/config/base/iceberg_daq_eth.json
  * stream/transport params; /root/reference/wibs/configure_timing.sh +
  * power_fembs.sh bring up exactly these ADC streams; each dromap src_id
  * names one). Every real DAQ analysis starts by decoding binary frames
  * into typed (channel, sample) rows; this module does that with the
  * codegen `wib_decode` expression and computes the shifter's first plot:
  * per-channel pedestal (mean), noise (RMS), and peak ADC.
  *
  * Scale shape: decode + posexplode + two-phase aggregation. The frame scan
  * stays in whole-stage codegen (native expression, no UDF), the explode is
  * pipelined (never materialized), and the only shuffle carries ONE partial
  * row per (channel, partition) — integer sums, not samples. At 100 TB of
  * frames the reduce side is bounded by channel count (det-scale: thousands),
  * so the query is scan-bound end to end. The dromap dim is a 12-row
  * broadcast.
  */
object Wib {

  /** Committed frame fixture (see `graft.tools.WibGen`). */
  val FramesPath = "data/wib/frames.parquet"
  /** Committed dromap fixture for the 12 WIB streams (reference shape). */
  val DromapPath = "data/dromaps/wib_dromap.json"

  def frames(s: SparkSession): DataFrame =
    s.read.parquet(Configs.absDir(FramesPath))

  /** Per-channel pedestal/RMS/peak over decoded samples, dromap-joined.
    * Exact integer sums (BIGINT) feed the double mean/RMS only in the final
    * projection — deterministic across engines and partitionings. */
  def qWibPedestal(s: SparkSession, d: String): DataFrame = {
    val dim = Dromap.flat(s, Configs.absDir(DromapPath))
      .select(col("src_id").cast("long").as("src_id"),
        col("det_id"), col("crate_id"), col("slot_id"))
    val decoded = frames(s)
      .select(GraftFunctions.wibDecode(col("payload")).as("f"))
      .select(col("f.src_id").as("src_id"), col("f.ts").as("ts"),
        posexplode(col("f.samples")).as(Seq("j", "sample")))
      .select(col("src_id"), col("ts"),
        (col("src_id") * WibFrame.Channels
          + col("j") % WibFrame.Channels).as("channel"),
        col("sample").cast("long").as("sample"))
    val stats = decoded
      .groupBy(col("src_id"), col("channel"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("sample")).as("sum_s"),
        sum(col("sample") * col("sample")).as("sum_sq"),
        max(col("sample")).as("peak_adc"),
        min(col("ts")).as("t_min"),
        max(col("ts")).as("t_max"))
    stats.join(broadcast(dim), "src_id")
      .select(col("det_id"), col("crate_id"), col("slot_id"), col("channel"),
        col("n_samples"),
        (col("sum_s").cast("double") / col("n_samples")).as("mean_adc"),
        sqrt(col("sum_sq").cast("double") / col("n_samples")
          - (col("sum_s").cast("double") / col("n_samples"))
            * (col("sum_s").cast("double") / col("n_samples"))).as("rms_adc"),
        col("peak_adc"), col("t_min"), col("t_max"))
  }

  /** Hex-pair value of 0-based byte `off` of the frame, as DuckDB SQL over
    * `hx` = hex(payload). */
  private def byteSql(off: String): String =
    s"((strpos('0123456789ABCDEF', substr(hx, 2*($off)+1, 1))-1)*16" +
      s" + (strpos('0123456789ABCDEF', substr(hx, 2*($off)+2, 1))-1))"

  /** The decode re-expressed as pure byte arithmetic over hex(payload) —
    * an INDEPENDENT DuckDB decode of the same binary (same discipline as
    * the Adler-32 closed-form oracle). */
  def qWibPedestalSql: String = {
    val nSamples = WibFrame.Channels * WibFrame.TicksPerChannel
    val tsTerms = (0 until 8)
      .map(k => s"CAST(${byteSql((4 + k).toString)} AS BIGINT) * ${1L << (8 * k)}")
      .mkString(" + ")
    val srcTerms = (0 until 4)
      .map(k => s"${byteSql(k.toString)} * ${1L << (8 * k)}")
      .mkString(" + ")
    s"""WITH h AS (
       |  SELECT hex(payload) AS hx
       |  FROM read_parquet('${Configs.absDir(FramesPath)}')
       |),
       |frames AS (
       |  SELECT CAST($srcTerms AS BIGINT) AS src_id, CAST($tsTerms AS BIGINT) AS ts, hx FROM h
       |),
       |samples AS (
       |  SELECT src_id, ts,
       |         src_id * ${WibFrame.Channels} + j % ${WibFrame.Channels} AS channel,
       |         CAST(${byteSql("12 + 2*j")} + 256 * ${byteSql("13 + 2*j")} AS BIGINT) AS sample
       |  FROM frames, generate_series(0, ${nSamples - 1}) AS t(j)
       |),
       |stats AS (
       |  SELECT src_id, channel, count(*) AS n_samples,
       |         CAST(sum(sample) AS BIGINT) AS sum_s,
       |         CAST(sum(sample * sample) AS BIGINT) AS sum_sq,
       |         max(sample) AS peak_adc, min(ts) AS t_min, max(ts) AS t_max
       |  FROM samples GROUP BY src_id, channel
       |),
       |dim AS (
       |  SELECT CAST(src_id AS BIGINT) AS src_id,
       |         CAST(geo_id.det_id AS INTEGER) AS det_id,
       |         CAST(geo_id.crate_id AS INTEGER) AS crate_id,
       |         CAST(geo_id.slot_id AS INTEGER) AS slot_id
       |  FROM read_json('${Configs.absDir(DromapPath)}', format='array')
       |)
       |SELECT det_id, crate_id, slot_id, channel, n_samples,
       |       CAST(sum_s AS DOUBLE) / n_samples AS mean_adc,
       |       sqrt(CAST(sum_sq AS DOUBLE) / n_samples
       |            - (CAST(sum_s AS DOUBLE) / n_samples)
       |              * (CAST(sum_s AS DOUBLE) / n_samples)) AS rms_adc,
       |       peak_adc, t_min, t_max
       |FROM stats JOIN dim USING (src_id)""".stripMargin
  }
}
