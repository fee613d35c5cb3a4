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

  /** Coherent (common-mode) noise analysis — the second plot on the
    * shifter's screen after pedestals: noise that moves all of a frame's
    * channels TOGETHER (grounding/power pickup) vs channel-local noise.
    * Per (frame, tick) the common mode is the 4-channel mean; per channel,
    * total RMS splits into an incoherent part (RMS of the residual
    * sample − commonMode) and the coherent remainder
    * sqrt(max(0, total² − incoherent²)).
    *
    * Determinism discipline: the residual is (4·sample − Σ4)/4 — kept as
    * the INTEGER numerator (4s − S) so every aggregation is an exact
    * BIGINT sum ((4s−S)² ≤ 6.9e10 per tick, ~2e14 per channel — far
    * inside BIGINT); doubles appear only in the final projection, so
    * partial-sum order can never move a bit.
    *
    * Shape: all of a tick's `Channels` samples live in the SAME decoded
    * frame row (channel-interleaved payload), so the per-tick sum is
    * computed IN-ROW with a higher-order `transform`/`aggregate` over the
    * samples array BEFORE `posexplode` — never a window over the exploded
    * sample stream (which would shuffle the entire detector stream once to
    * compute something each row already contains). The only shuffle is the
    * final per-channel aggregation, bounded by channel count; everything
    * before it pipelines inside the scan stage (PlanSpec: no Window). */
  def qWibCoherent(s: SparkSession, d: String): DataFrame = {
    val c = WibFrame.Channels.toLong
    val dim = Dromap.flat(s, Configs.absDir(DromapPath))
      .select(col("src_id").cast("long").as("src_id"),
        col("det_id"), col("crate_id"), col("slot_id"))
    val withCm = frames(s)
      .select(GraftFunctions.wibDecode(col("payload")).as("f"))
      .select(col("f.src_id").as("src_id"), col("f.samples").as("samples"))
      // per-tick channel sums, one BIGINT per tick, computed inside the row
      .withColumn("ticksums", expr(
        s"transform(sequence(0, size(samples) DIV $c - 1)," +
          s" t -> aggregate(slice(samples, t * $c + 1, $c)," +
          s" CAST(0 AS BIGINT), (a, x) -> a + x))"))
      .select(col("src_id"), col("ticksums"),
        posexplode(col("samples")).as(Seq("j", "sample")))
      .select(col("src_id"),
        (col("src_id") * c + col("j") % c).as("channel"),
        col("sample").cast("long").as("sample"),
        (col("sample").cast("long") * c
          - element_at(col("ticksums"),
            (expr(s"j DIV $c") + 1).cast("int"))).as("num"))
    val g = withCm.groupBy(col("src_id"), col("channel"))
      .agg(count(lit(1)).as("n"),
        sum(col("sample")).as("ss"),
        sum(col("sample") * col("sample")).as("ssq"),
        sum(col("num")).as("sn"),
        sum(col("num") * col("num")).as("sn2"))
    val derived = g
      .withColumn("m", col("ss").cast("double") / col("n"))
      .withColumn("mi", col("sn").cast("double") / (col("n") * c))
      .withColumn("tot2",
        col("ssq").cast("double") / col("n") - col("m") * col("m"))
      .withColumn("inc2",
        col("sn2").cast("double") / (col("n") * c * c) - col("mi") * col("mi"))
    derived.join(broadcast(dim), "src_id")
      .select(col("det_id"), col("crate_id"), col("slot_id"), col("channel"),
        col("n").as("n_samples"),
        sqrt(col("tot2")).as("rms_total"),
        sqrt(col("inc2")).as("rms_incoherent"),
        sqrt(greatest(col("tot2") - col("inc2"), lit(0.0))).as("rms_coherent"))
  }

  def qWibCoherentSql: String = {
    val nSamples = WibFrame.Channels * WibFrame.TicksPerChannel
    val srcTerms = (0 until 4)
      .map(k => s"${byteSql(k.toString)} * ${1L << (8 * k)}")
      .mkString(" + ")
    val c = WibFrame.Channels
    s"""WITH h AS (
       |  SELECT frame_id, hex(payload) AS hx
       |  FROM read_parquet('${Configs.absDir(FramesPath)}')
       |),
       |s AS (
       |  SELECT frame_id, CAST($srcTerms AS BIGINT) AS src_id,
       |         j // $c AS tick,
       |         CAST($srcTerms AS BIGINT) * $c + j % $c AS channel,
       |         CAST(${byteSql(s"12 + 2*j")} + 256 * ${byteSql(s"13 + 2*j")} AS BIGINT) AS sample
       |  FROM h, generate_series(0, ${nSamples - 1}) AS t(j)
       |),
       |cm AS (SELECT frame_id, tick, sum(sample) AS s4 FROM s GROUP BY 1, 2),
       |r AS (
       |  SELECT s.src_id, s.channel, s.sample,
       |         s.sample * $c - cm.s4 AS num
       |  FROM s JOIN cm USING (frame_id, tick)
       |),
       |g AS (
       |  SELECT src_id, channel, count(*) AS n,
       |         CAST(sum(sample) AS BIGINT) AS ss,
       |         CAST(sum(sample * sample) AS BIGINT) AS ssq,
       |         CAST(sum(num) AS BIGINT) AS sn,
       |         CAST(sum(num * num) AS BIGINT) AS sn2
       |  FROM r GROUP BY src_id, channel
       |),
       |d0 AS (
       |  SELECT src_id, channel, n,
       |         CAST(ss AS DOUBLE) / n AS m,
       |         CAST(sn AS DOUBLE) / (n * $c) AS mi,
       |         CAST(ssq AS DOUBLE) / n AS e2,
       |         CAST(sn2 AS DOUBLE) / (n * $c * $c) AS ei2
       |  FROM g
       |),
       |der AS (
       |  SELECT src_id, channel, n, e2 - m * m AS tot2, ei2 - mi * mi AS inc2
       |  FROM d0
       |),
       |dim AS (
       |  SELECT CAST(src_id AS BIGINT) AS src_id,
       |         CAST(geo_id.det_id AS INTEGER) AS det_id,
       |         CAST(geo_id.crate_id AS INTEGER) AS crate_id,
       |         CAST(geo_id.slot_id AS INTEGER) AS slot_id
       |  FROM read_json('${Configs.absDir(DromapPath)}', format='array')
       |)
       |SELECT det_id, crate_id, slot_id, channel, n AS n_samples,
       |       sqrt(tot2) AS rms_total, sqrt(inc2) AS rms_incoherent,
       |       sqrt(greatest(tot2 - inc2, 0)) AS rms_coherent
       |FROM der JOIN dim USING (src_id)""".stripMargin
  }

  /** Hex-pair value of 0-based byte `off` of the frame, as DuckDB SQL over
    * `hx` = hex(payload). */
  /** Hit threshold in ADC counts above the per-(frame, channel)
    * pedestal — comfortably above the fixture's ~40-count noise
    * envelope and far below its ~3000-count planted pulses. */
  val HitThresholdAdc = 256L

  /** TPC HIT FINDING — the core signal primitive every LArTPC analysis
    * chain runs after pedestal subtraction (a "hit" = a run of
    * consecutive ticks where a channel's waveform exceeds its pedestal
    * by a threshold; cf. the reference's WIB streams,
    * wibs/power_fembs.sh — these ADC pulses ARE the physics): per
    * (frame, channel), pedestal P = Σ of its T ticks; tick t is hot iff
    * T·s_t − P > T·[[HitThresholdAdc]] (the n-multiplication rule — the
    * rational pedestal never divides); consecutive hot ticks group into
    * hits via the gaps-and-islands run id (tick − row_number, the
    * q_deadtime_runs machinery); per channel the report carries hit
    * count, hot-tick count, total charge Σ(T·s − P) (exact BIGINT,
    * ≤ T²·2¹⁶ per hit), and the peak ADC.
    *
    * Scale shape: pedestals compute IN-ROW (all of a frame's samples
    * live in its decoded row — a per-channel aggregate over the
    * interleaved array, the qWibCoherent rule: never a window over the
    * exploded sample stream); the explode pipelines inside the scan;
    * only ABOVE-THRESHOLD ticks (sparse by construction) reach the
    * bounded (frame, channel)-partition run window; the final shuffle
    * carries one row per hit. Channel-count-bounded output. */
  def qWibHits(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = WibFrame.Channels
    val t = WibFrame.TicksPerChannel
    val dim = Dromap.flat(s, Configs.absDir(DromapPath))
      .select(col("src_id").cast("long").as("src_id"),
        col("det_id"), col("crate_id"), col("slot_id"))
    val ex = frames(s)
      .select(GraftFunctions.wibDecode(col("payload")).as("f"))
      .select(col("f.src_id").as("src_id"), col("f.ts").as("ts"),
        col("f.samples").as("samples"))
      // per-channel pedestal sums, computed inside the frame row
      .withColumn("chansums", expr(
        s"transform(sequence(0, ${c - 1}), ch -> " +
          s"aggregate(sequence(0, ${t - 1}), CAST(0 AS BIGINT), " +
          s"(a, tk) -> a + element_at(samples, tk * $c + ch + 1)))"))
      .select(col("src_id"), col("ts"), col("chansums"),
        posexplode(col("samples")).as(Seq("j", "sample")))
      .select(col("src_id"), col("ts"),
        (col("src_id") * c + col("j") % c).as("channel"),
        expr(s"j DIV $c").as("tick"),
        col("sample").cast("long").as("sample"),
        (col("sample").cast("long") * t
          - element_at(col("chansums"), (col("j") % c + 1).cast("int")))
          .as("excess"))
      .filter(col("excess") > t * HitThresholdAdc)
    val w = Window.partitionBy(col("src_id"), col("ts"), col("channel"))
      .orderBy(col("tick"))
    val hits = ex
      .withColumn("run", col("tick") - row_number().over(w))
      .groupBy(col("src_id"), col("ts"), col("channel"), col("run"))
      .agg(count(lit(1)).as("width"), sum(col("excess")).as("charge"),
        max(col("sample")).as("peak"))
    hits.groupBy(col("src_id"), col("channel"))
      .agg(count(lit(1)).as("n_hits"),
        sum(col("width")).cast("long").as("n_hit_ticks"),
        sum(col("charge")).cast("long").as("charge_scaled"),
        max(col("peak")).as("peak_adc"))
      .join(broadcast(dim), "src_id")
      .select(col("det_id"), col("crate_id"), col("slot_id"),
        col("channel"), col("n_hits"), col("n_hit_ticks"),
        col("charge_scaled"), col("peak_adc"))
  }

  def qWibHitsSql: String = {
    val c = WibFrame.Channels
    val t = WibFrame.TicksPerChannel
    val nSamples = c * t
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
       |  SELECT CAST($srcTerms AS BIGINT) AS src_id,
       |         CAST($tsTerms AS BIGINT) AS ts, hx FROM h
       |),
       |samples AS MATERIALIZED (
       |  SELECT src_id, ts,
       |         src_id * $c + j % $c AS channel,
       |         CAST(j // $c AS BIGINT) AS tick,
       |         CAST(${byteSql("12 + 2*j")} + 256 * ${byteSql("13 + 2*j")}
       |           AS BIGINT) AS sample
       |  FROM frames, generate_series(0, ${nSamples - 1}) AS g(j)
       |),
       |ped AS (
       |  SELECT src_id, ts, channel, CAST(sum(sample) AS BIGINT) AS p
       |  FROM samples GROUP BY src_id, ts, channel
       |),
       |ex AS (
       |  SELECT s.src_id, s.ts, s.channel, s.tick, s.sample,
       |         $t * s.sample - p.p AS excess
       |  FROM samples s JOIN ped p USING (src_id, ts, channel)
       |  WHERE $t * s.sample - p.p > $t * $HitThresholdAdc
       |),
       |runs AS (
       |  SELECT *, tick - row_number() OVER (
       |    PARTITION BY src_id, ts, channel ORDER BY tick) AS run
       |  FROM ex
       |),
       |hits AS (
       |  SELECT src_id, ts, channel, run,
       |    CAST(count(*) AS BIGINT) AS width,
       |    CAST(sum(excess) AS BIGINT) AS charge,
       |    max(sample) AS peak
       |  FROM runs GROUP BY src_id, ts, channel, run
       |),
       |per_ch AS (
       |  SELECT src_id, channel, CAST(count(*) AS BIGINT) AS n_hits,
       |    CAST(sum(width) AS BIGINT) AS n_hit_ticks,
       |    CAST(sum(charge) AS BIGINT) AS charge_scaled,
       |    max(peak) AS peak_adc
       |  FROM hits GROUP BY src_id, channel
       |),
       |dim AS (
       |  SELECT CAST(src_id AS BIGINT) AS src_id,
       |         CAST(geo_id.det_id AS INTEGER) AS det_id,
       |         CAST(geo_id.crate_id AS INTEGER) AS crate_id,
       |         CAST(geo_id.slot_id AS INTEGER) AS slot_id
       |  FROM read_json('${Configs.absDir(DromapPath)}', format='array')
       |)
       |SELECT det_id, crate_id, slot_id, channel, n_hits, n_hit_ticks,
       |       charge_scaled, peak_adc
       |FROM per_ch JOIN dim USING (src_id)""".stripMargin
  }

  /** CHANNEL-STATUS CLASSIFICATION — the detector QA map every shifter
    * keeps open (DUNE's "channel status database" semantics: DEAD =
    * stuck/disconnected ADC, NOISY = variance far above its peers, GOOD
    * otherwise), computed as pure integers: per channel the n-multiplied
    * variance a = n·Σs² − (Σs)² is exact, quantized ONCE to
    * q = (1e6·a) DIV n² (exact DECIMAL(38,0)/HUGEINT floor — channels
    * with different sample counts compare on the same grid), and the
    * noisy gate is the Hampel-style integer compare q > 2·med2q against
    * the DOUBLED median of the per-channel q's (the q_evt_mad order-
    * statistic discipline — no interpolation anywhere). DEAD ⟺ a = 0.
    *
    * Scale shape: one decode+aggregate pass to a CHANNEL-BOUNDED frame
    * (det-scale: thousands of rows at 100 TB of frames), then all median
    * and gate math on that bounded frame — the documented KB-frame
    * exception for the partition-less rank window. */
  def qWibBadchannels(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = Dromap.flat(s, Configs.absDir(DromapPath))
      .select(col("src_id").cast("long").as("src_id"),
        col("det_id"), col("crate_id"), col("slot_id"))
    val g = frames(s)
      .select(GraftFunctions.wibDecode(col("payload")).as("f"))
      .select(col("f.src_id").as("src_id"),
        posexplode(col("f.samples")).as(Seq("j", "sample")))
      .select(col("src_id"),
        (col("src_id") * WibFrame.Channels
          + col("j") % WibFrame.Channels).as("channel"),
        col("sample").cast("long").as("sample"))
      .groupBy(col("src_id"), col("channel"))
      .agg(count(lit(1)).as("n"),
        sum(col("sample")).as("ss"),
        sum(col("sample") * col("sample")).as("ssq"))
      .withColumn("a", expr(
        "CAST(n AS DECIMAL(38,0)) * ssq - CAST(ss AS DECIMAL(38,0)) * ss"))
      .withColumn("var_scaled", expr(
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * a" +
          " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .localCheckpoint() // channel-bounded; feeds the median + the report
    val k = g.agg(count(lit(1)).as("k"))
    val med = g
      .withColumn("rn", row_number().over( // bounded det-scale frame
        Window.orderBy(col("var_scaled"), col("channel"))).cast("long"))
      .crossJoin(broadcast(k))
      .select(
        (when(col("rn") === expr("(k + 1) DIV 2"), col("var_scaled"))
          .otherwise(lit(0L)) +
          when(col("rn") === expr("(k + 2) DIV 2"), col("var_scaled"))
            .otherwise(lit(0L))).as("m"))
      .agg(sum(col("m")).cast("long").as("med2q"))
    g.crossJoin(broadcast(med))
      .join(broadcast(dim), "src_id")
      .select(col("det_id"), col("crate_id"), col("slot_id"),
        col("channel"), col("n").cast("long").as("n_samples"),
        col("var_scaled"), col("med2q"),
        when(col("a") === 0, lit("dead"))
          .when(col("var_scaled") > col("med2q") * 2, lit("noisy"))
          .otherwise(lit("good")).as("status"))
  }

  def qWibBadchannelsSql: String = {
    val c = WibFrame.Channels
    val nSamples = c * WibFrame.TicksPerChannel
    val srcTerms = (0 until 4)
      .map(k => s"${byteSql(k.toString)} * ${1L << (8 * k)}")
      .mkString(" + ")
    s"""WITH h AS (
       |  SELECT hex(payload) AS hx
       |  FROM read_parquet('${Configs.absDir(FramesPath)}')
       |),
       |s AS (
       |  SELECT CAST($srcTerms AS BIGINT) AS src_id,
       |         CAST($srcTerms AS BIGINT) * $c + j % $c AS channel,
       |         CAST(${byteSql("12 + 2*j")} + 256 * ${byteSql("13 + 2*j")}
       |           AS BIGINT) AS sample
       |  FROM h, generate_series(0, ${nSamples - 1}) AS t(j)
       |),
       |g AS (
       |  SELECT src_id, channel, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(sample) AS BIGINT) AS ss,
       |         CAST(sum(sample * sample) AS BIGINT) AS ssq
       |  FROM s GROUP BY src_id, channel
       |),
       |q AS (
       |  SELECT src_id, channel, n,
       |    CAST(n AS HUGEINT) * ssq - CAST(ss AS HUGEINT) * ss AS a,
       |    CAST(CAST(1000000 AS HUGEINT)
       |      * (CAST(n AS HUGEINT) * ssq - CAST(ss AS HUGEINT) * ss)
       |      // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_scaled
       |  FROM g
       |),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM q),
       |med AS (
       |  SELECT CAST(sum(
       |    CASE WHEN rn = (k + 1) // 2 THEN var_scaled ELSE 0 END +
       |    CASE WHEN rn = (k + 2) // 2 THEN var_scaled ELSE 0 END)
       |    AS BIGINT) AS med2q
       |  FROM (SELECT var_scaled,
       |          row_number() OVER (ORDER BY var_scaled, channel) AS rn
       |        FROM q) r CROSS JOIN kk
       |),
       |dim AS (
       |  SELECT CAST(src_id AS BIGINT) AS src_id,
       |         CAST(geo_id.det_id AS INTEGER) AS det_id,
       |         CAST(geo_id.crate_id AS INTEGER) AS crate_id,
       |         CAST(geo_id.slot_id AS INTEGER) AS slot_id
       |  FROM read_json('${Configs.absDir(DromapPath)}', format='array')
       |)
       |SELECT det_id, crate_id, slot_id, channel, n AS n_samples,
       |  var_scaled, med2q,
       |  CASE WHEN a = 0 THEN 'dead'
       |       WHEN var_scaled > med2q * 2 THEN 'noisy'
       |       ELSE 'good' END AS status
       |FROM q CROSS JOIN med JOIN dim USING (src_id)""".stripMargin
  }

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

  /** Spectrum window length (power of two; 4 frames' worth of ticks per
    * channel at the fixture's 64 ticks/frame). */
  val NoiseFftN = 256

  /** Driver query [rows]: per-channel NOISE POWER SPECTRUM — the third
    * plot on the shifter's screen after pedestals and coherent noise:
    * WHERE in frequency the noise lives (a mains/clock pickup line shows
    * as a narrow spectral peak; white electronics noise is flat). Per
    * channel, the first [[NoiseFftN]] samples in (ts, tick) order are
    * pedestal-subtracted and FFT'd in-task (the in-JVM radix-2 kernel
    * the audio path uses — [[Multimodal.Fft]]); output is one row per
    * (channel, bin) with the one-sided power, plus each channel's peak
    * bin flagged. Deterministic: the window is ts-ordered, the FFT is a
    * fixed sequential butterfly, no partial-sum reordering anywhere.
    *
    * Scale shape (r16 advisor fix — the window is BOUNDED BEFORE the
    * shuffle, not after): the earliest ⌈N/ticks⌉ FRAMES per src are
    * selected by a [[graft.plans.TopKPerGroup]] two-phase pass (a
    * partial bounded heap per scan partition with NO exchange, then the
    * clustered final — the shuffle carries ≤ partitions·srcs·k frame
    * rows, never the run), so the per-channel task buffers exactly N
    * samples regardless of run length. The heap orders by −ts with a
    * ts-ASC tiebreak (negation+double rounding is monotone, so the
    * survivors are exactly the k smallest ts; a ts tie ACROSS the cut
    * boundary is the same ambiguity the previous sort-everything form
    * had). The per-channel series then shuffles N samples per channel
    * (channel-bounded, detector-scale thousands), and each channel's
    * FFT runs inside one task. */
  def qWibNoiseFft(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = Dromap.flat(s, Configs.absDir(DromapPath))
      .select(col("src_id").cast("long").as("src_id"),
        col("det_id"), col("crate_id"), col("slot_id"))
    val kFrames =
      (NoiseFftN + WibFrame.TicksPerChannel - 1) / WibFrame.TicksPerChannel
    val sliced = graft.plans.TopKPerGroup.twoPhase(
      frames(s)
        .select(col("payload"), GraftFunctions.wibDecode(col("payload"))
          .getField("src_id").cast("long").as("__src"))
        .withColumn("__ts", GraftFunctions.wibDecode(col("payload"))
          .getField("ts").cast("long"))
        .withColumn("__ord", (-col("__ts")).cast("double")),
      kFrames, "__src", "__ord", "__ts")
    val decoded = sliced
      .select(GraftFunctions.wibDecode(col("payload")).as("f"))
      .select(col("f.src_id").as("src_id"), col("f.ts").as("ts"),
        posexplode(col("f.samples")).as(Seq("j", "sample")))
      .select(col("src_id"),
        (col("src_id") * WibFrame.Channels
          + col("j") % WibFrame.Channels).as("channel"),
        col("ts"), col("j").cast("long").as("j"),
        col("sample").cast("double").as("sample"))
      .as[(Long, Long, Long, Long, Double)]
    val spectra = decoded.groupByKey(_._2)
      .flatMapGroups { (ch, it) =>
        val xs = it.toArray.sortBy(r => (r._3, r._4)).take(NoiseFftN)
        if (xs.length < NoiseFftN) Iterator.empty
        else {
          val srcId = xs.head._1
          val mean = xs.map(_._5).sum / NoiseFftN
          val re = xs.map(_._5 - mean)
          val im = new Array[Double](NoiseFftN)
          Multimodal.Fft.fft(re, im)
          val pow = (1 to NoiseFftN / 2).map(k =>
            re(k) * re(k) + im(k) * im(k))
          val peak = pow.indices.maxBy(i => (pow(i), -i)) // tie: low bin
          pow.iterator.zipWithIndex.map { case (p, i) =>
            (srcId, ch, (i + 1).toLong, p, i == peak)
          }
        }
      }
      .toDF("src_id", "channel", "bin", "power", "is_peak")
    spectra.join(broadcast(dim), "src_id")
      .select(col("det_id"), col("crate_id"), col("slot_id"),
        col("channel"), col("bin"), col("power"), col("is_peak"))
      .orderBy(col("channel"), col("bin"))
  }
}
