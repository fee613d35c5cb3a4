package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.B — trigger-configuration dimension: the reference's tlu scripts
  * carry trigger state the engine should be able to query — fake-trigger
  * command + rate (cf. tlu/tlu-start.sh "faketrig-conf 2 2 2" → 2 Hz),
  * the HSI rising-edge channel mask (cf. tlu/t-c-p-iceberg.sh
  * "hsi ... configure -r 16777248": bits 5 and 24 = cosmic + command
  * decoder), spill enable, and the enabled timing endpoint. Each config
  * application opens an EPOCH (valid_from until the next application) —
  * the natural dimension to answer "did the trigger config change the
  * coincidence rate".
  *
  * Control-plane data like Configs/Runs: KB-scale, explicit schema,
  * broadcast into every fact join; the single-partition window deriving
  * valid_until is deliberate (4 rows, not 4 billion).
  */
object Trigger {

  /** Repo-relative default path of the trigger-epoch fixture. */
  val DefaultPath = "data/trigger/trigger_epochs.jsonl"

  /** Explicit schema for trigger-config records (one JSON object per
    * line, the tlu-apply emit shape). */
  val epochSchema: StructType = StructType(Seq(
    StructField("epoch_id", LongType, nullable = false),
    StructField("device", StringType, nullable = false),
    StructField("valid_from", TimestampType, nullable = false),
    StructField("faketrig_cmd", LongType),
    StructField("faketrig_rate_hz", LongType),
    StructField("hsi_re_mask", LongType),
    StructField("cosmic_channel", LongType),
    StructField("pulser_channel", LongType),
    StructField("spill_enable", LongType),
    StructField("endpoint_addr", LongType)))

  /** The trigger-epoch dimension with valid_until = next epoch's
    * valid_from (NULL for the open current epoch). */
  def epochs(s: SparkSession, path: String = DefaultPath): DataFrame =
    s.read.schema(epochSchema)
      .json(graft.sources.Configs.absDir(path))
      .withColumn("valid_until",
        lead(col("valid_from"), 1).over(Window.orderBy(col("valid_from"))))

  /** Bit `ch` of `mask` — channel-enable decode of the HSI rising-edge
    * mask. pow-based so the same arithmetic runs on both engines (the
    * masks are < 2^25, exact in doubles). */
  private def maskBit(mask: org.apache.spark.sql.Column,
      ch: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(floor(mask / pow(lit(2.0), ch)).cast("bigint"), lit(2L))

  /** The decoded dimension: per epoch, is the cosmic / pulser channel
    * actually enabled in the HSI mask — the misconfiguration the tlu
    * script comments warn about (a rate with its channel masked out
    * records nothing). */
  def qTrigEpochs(s: SparkSession, d: String): DataFrame =
    epochs(s)
      .select(col("epoch_id"), col("device"), col("valid_from"),
        col("valid_until"), col("faketrig_rate_hz"), col("hsi_re_mask"),
        maskBit(col("hsi_re_mask"), col("cosmic_channel")).as("cosmic_enabled"),
        maskBit(col("hsi_re_mask"), col("pulser_channel")).as("pulser_enabled"),
        col("spill_enable"), col("endpoint_addr"))

  def qTrigEpochsSql: String = {
    val p = graft.sources.Configs.absDir(DefaultPath)
    s"""WITH ep AS (SELECT *, CAST(valid_from AS TIMESTAMP) AS vf
       |  FROM read_json_auto('$p'))
       |SELECT epoch_id, device, vf AS valid_from,
       |  lead(vf) OVER (ORDER BY vf) AS valid_until,
       |  faketrig_rate_hz, hsi_re_mask,
       |  CAST(floor(hsi_re_mask / power(2, cosmic_channel)) AS BIGINT) % 2
       |    AS cosmic_enabled,
       |  CAST(floor(hsi_re_mask / power(2, pulser_channel)) AS BIGINT) % 2
       |    AS pulser_enabled,
       |  spill_enable, endpoint_addr
       |FROM ep""".stripMargin
  }

  /** Trigger-rate QA — "is the trigger actually firing at the configured
    * rate": per epoch, the measured event rate vs the configured
    * fake-trigger rate (cf. tlu/tlu-start.sh "faketrig-conf 2 2 2" → 2 Hz;
    * a rate whose HSI channel is masked out records NOTHING — the
    * misconfiguration qTrigEpochs decodes is exactly what this catches as
    * measured ≈ 0). The epoch span is clamped to the observed event range
    * (the open last epoch has no valid_until; an epoch before the first
    * event measures over zero span and drops). Exact integer counts and
    * microsecond spans; the rate double only in the final projection. */
  def qTrigRateCheck(s: SparkSession, d: String): DataFrame = {
    val ev = Events.events(s, d)
    val ep = epochs(s)
    val span = ev.agg(min(col("ts")).as("ev_lo"), max(col("ts")).as("ev_hi"))
    val counts = ev.join(broadcast(ep),
        ev("ts") >= ep("valid_from")
          && (ep("valid_until").isNull || ev("ts") < ep("valid_until")))
      .groupBy(col("epoch_id"))
      .agg(count(lit(1)).as("n_events"))
    ep.crossJoin(broadcast(span))
      .select(col("epoch_id"), col("faketrig_rate_hz"),
        greatest(col("valid_from"), col("ev_lo")).as("lo"),
        least(coalesce(col("valid_until"), col("ev_hi")), col("ev_hi")).as("hi"))
      .filter(col("hi") > col("lo"))
      .join(counts, Seq("epoch_id"), "left")
      .withColumn("span_us", unix_micros(col("hi")) - unix_micros(col("lo")))
      .withColumn("span_s", expr("span_us DIV 1000000")) // integer seconds (oracle //)
      .filter(col("span_s") > 0)
      .select(col("epoch_id"), col("faketrig_rate_hz"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("span_s"),
        (coalesce(col("n_events"), lit(0L)).cast("double") / col("span_s"))
          .as("measured_hz"))
  }

  def qTrigRateCheckSql: String = {
    val p = graft.sources.Configs.absDir(DefaultPath)
    s"""WITH ep0 AS (SELECT epoch_id, faketrig_rate_hz,
       |    CAST(valid_from AS TIMESTAMP) AS valid_from
       |  FROM read_json_auto('$p')),
       |ep AS (SELECT *, lead(valid_from) OVER (ORDER BY valid_from)
       |    AS valid_until FROM ep0),
       |span AS (SELECT min(ts) AS ev_lo, max(ts) AS ev_hi FROM events),
       |counts AS (SELECT ep.epoch_id, count(*) AS n_events
       |  FROM events ev JOIN ep ON ev.ts >= ep.valid_from
       |    AND (ep.valid_until IS NULL OR ev.ts < ep.valid_until)
       |  GROUP BY ep.epoch_id),
       |clamped AS (SELECT ep.epoch_id, ep.faketrig_rate_hz,
       |    greatest(ep.valid_from, span.ev_lo) AS lo,
       |    least(coalesce(ep.valid_until, span.ev_hi), span.ev_hi) AS hi
       |  FROM ep, span)
       |SELECT c.epoch_id, c.faketrig_rate_hz,
       |  CAST(coalesce(n.n_events, 0) AS BIGINT) AS n_events,
       |  (epoch_us(c.hi) - epoch_us(c.lo)) // 1000000 AS span_s,
       |  CAST(coalesce(n.n_events, 0) AS DOUBLE)
       |    / ((epoch_us(c.hi) - epoch_us(c.lo)) // 1000000) AS measured_hz
       |FROM clamped c LEFT JOIN counts n ON c.epoch_id = n.epoch_id
       |WHERE c.hi > c.lo
       |  AND (epoch_us(c.hi) - epoch_us(c.lo)) // 1000000 > 0""".stripMargin
  }

  /** Coincidence counting per trigger-config epoch — "did the config
    * change the coincidence rate": q_evt_coincidence's bucketed equi-join
    * (never a time cross-join), with the error side stamped by its epoch
    * via broadcast range join first. Output one row per
    * (epoch, other event type): how many error events saw a coincidence,
    * and how many coincident pairs, under that trigger config. */
  def qTrigCoincidence(s: SparkSession, d: String): DataFrame = {
    val ev = Events.events(s, d)
    val ep = epochs(s)
    val sec = Events.CoincSeconds
    val errs = ev.filter(col("event_type") === "error")
      .join(broadcast(ep),
        ev("ts") >= ep("valid_from")
          && (ep("valid_until").isNull || ev("ts") < ep("valid_until")))
      .withColumn("b", floor(unix_timestamp(col("ts")) / sec))
      .select(col("event_id").as("error_id"), col("ts").as("err_ts"),
        col("epoch_id"), col("faketrig_rate_hz"),
        explode(array(col("b") - 1, col("b"), col("b") + 1)).as("bucket"))
    val others = ev.filter(col("event_type") =!= "error")
      .select(col("event_type"), col("ts").as("o_ts"),
        floor(unix_timestamp(col("ts")) / sec).as("bucket"))
    errs.join(others, "bucket")
      .filter(abs(unix_micros(col("o_ts")) - unix_micros(col("err_ts")))
        <= sec * 1000000L)
      .groupBy(col("epoch_id"), col("faketrig_rate_hz"), col("event_type"))
      .agg(countDistinct(col("error_id")).as("n_errors"),
        count(lit(1)).as("n_coincident"))
  }

  def qTrigCoincidenceSql: String = {
    val p = graft.sources.Configs.absDir(DefaultPath)
    val sec = Events.CoincSeconds
    s"""WITH ep0 AS (SELECT epoch_id, faketrig_rate_hz,
       |    CAST(valid_from AS TIMESTAMP) AS valid_from
       |  FROM read_json_auto('$p')),
       |ep AS (SELECT *, lead(valid_from) OVER (ORDER BY valid_from)
       |    AS valid_until FROM ep0),
       |e AS (SELECT ev.event_id, ev.ts, ep.epoch_id, ep.faketrig_rate_hz
       |  FROM events ev JOIN ep ON ev.ts >= ep.valid_from
       |    AND (ep.valid_until IS NULL OR ev.ts < ep.valid_until)
       |  WHERE ev.event_type = 'error')
       |SELECT e.epoch_id, e.faketrig_rate_hz, o.event_type,
       |  CAST(count(DISTINCT e.event_id) AS BIGINT) AS n_errors,
       |  CAST(count(*) AS BIGINT) AS n_coincident
       |FROM e JOIN events o ON o.event_type <> 'error'
       |  AND abs(epoch_us(o.ts) - epoch_us(e.ts)) <= ${sec}000000
       |GROUP BY e.epoch_id, e.faketrig_rate_hz, o.event_type""".stripMargin
  }
}
