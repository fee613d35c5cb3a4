package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** §2.F — Structured Streaming ingest, the Spark-native re-expression of the
  * reference's DAQ data path (run_iceberg_daq.sh: fixed-rate sources →
  * readout apps → storage). The DAQ hardware-control side is out of scope
  * (SURVEY.md §4); what Spark owns is the stream *processing*: windowed
  * aggregation, stateful sessionization, and duplicate suppression, each
  * with watermark-bounded state so a 1000-executor cluster never accretes
  * unbounded state.
  *
  * Transformations are `DataFrame => DataFrame` so the SAME code runs in
  * batch (oracle-checked via q_evt_tumbling) and on a `readStream` source —
  * Structured Streaming's incrementalization guarantees consistent results.
  */
object Streams {

  /** Watermarked tumbling-window aggregation (1h windows, 10m late-data
    * allowance). State per (window, event_type) is dropped once the
    * watermark passes the window end. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream dedup on event_id within the watermark horizon — the
    * trigger-record duplicate suppression pattern. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")

  /** Online per-channel pedestal monitor — the STREAMING twin of
    * `Wib.qWibPedestal` (the live plot a shifter watches while frames
    * land): raw frame rows stream in, the native `wib_decode` expression
    * runs inside the micro-batch scan, and per-channel counts/sums
    * accumulate as exact BIGINT partial aggregates. A `DataFrame =>
    * DataFrame` transform, so Structured Streaming incrementalizes the
    * SAME plan the batch query runs — the spec proves the streamed totals
    * equal the batch computation over all landed frames. State is one row
    * per channel (det-scale), so complete-mode output is bounded. Doubles
    * (mean/RMS) are derived downstream of the exact sums, never
    * accumulated. */
  def wibMonitor(frames: DataFrame): DataFrame = {
    import graft.functions.{GraftFunctions, WibFrame}
    frames
      .select(GraftFunctions.wibDecode(col("payload")).as("f"))
      .select(col("f.src_id").as("src_id"),
        posexplode(col("f.samples")).as(Seq("j", "sample")))
      .select(
        (col("src_id") * WibFrame.Channels
          + col("j") % WibFrame.Channels).as("channel"),
        col("sample").cast("long").as("sample"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("sample")).as("sum_s"),
        sum(col("sample") * col("sample")).as("sum_sq"),
        max(col("sample")).as("peak_adc"))
  }

  /** Online TPC hit monitor — the STREAMING twin of `Wib.qWibHits`
    * (the live hit-rate board: which channels are seeing pulses as
    * frames land). Hit finding is fully PER-FRAME (pedestal from the
    * frame's own ticks; runs bounded by the frame), so the whole finder
    * folds IN-ROW with higher-order functions — run starts count as
    * hot∧¬prev transitions inside one `aggregate` fold per channel, no
    * window anywhere — and the only stateful stage is the per-channel
    * accumulation of exact BIGINT totals (det-scale state, bounded
    * complete-mode output). The spec proves the streamed totals equal
    * the batch q_wib_hits aggregates over the same frames, across
    * micro-batch splits. */
  def wibHitMonitor(frames: DataFrame): DataFrame = {
    import graft.functions.{GraftFunctions, WibFrame}
    val c = WibFrame.Channels
    val t = WibFrame.TicksPerChannel
    val cut = t * graft.operators.Wib.HitThresholdAdc
    def hot(sample: String): String =
      s"CAST($sample AS BIGINT) * $t - element_at(chansums, ch + 1) > $cut"
    val samp = s"element_at(samples, tk * $c + ch + 1)"
    frames
      .select(GraftFunctions.wibDecode(col("payload")).as("f"))
      .select(col("f.src_id").as("src_id"), col("f.samples").as("samples"))
      .withColumn("chansums", expr(
        s"transform(sequence(0, ${c - 1}), ch -> " +
          s"aggregate(sequence(0, ${t - 1}), CAST(0 AS BIGINT), " +
          s"(a, tk) -> a + element_at(samples, tk * $c + ch + 1)))"))
      .withColumn("chstats", expr(
        s"""transform(sequence(0, ${c - 1}), ch ->
           |  aggregate(sequence(0, ${t - 1}),
           |    named_struct('nh', CAST(0 AS BIGINT), 'prev', false,
           |      'nt', CAST(0 AS BIGINT), 'chg', CAST(0 AS BIGINT),
           |      'pk', CAST(0 AS BIGINT)),
           |    (acc, tk) -> named_struct(
           |      'nh', acc.nh + IF(${hot(samp)} AND NOT acc.prev,
           |        CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
           |      'prev', ${hot(samp)},
           |      'nt', acc.nt + IF(${hot(samp)},
           |        CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
           |      'chg', acc.chg + IF(${hot(samp)},
           |        CAST($samp AS BIGINT) * $t
           |          - element_at(chansums, ch + 1), CAST(0 AS BIGINT)),
           |      'pk', greatest(acc.pk, IF(${hot(samp)},
           |        CAST($samp AS BIGINT), CAST(0 AS BIGINT))))))""".stripMargin))
      .select(col("src_id"), posexplode(col("chstats")).as(Seq("ch", "st")))
      .select((col("src_id") * c + col("ch")).as("channel"),
        col("st.nh").as("nh"), col("st.nt").as("nt"),
        col("st.chg").as("chg"), col("st.pk").as("pk"))
      .groupBy(col("channel"))
      .agg(sum(col("nh")).as("n_hits"),
        sum(col("nt")).as("n_hit_ticks"),
        sum(col("chg")).as("charge_scaled"),
        max(col("pk")).as("peak_adc"))
  }

  /** Online operational-log monitor — the STREAMING twin of
    * `Logs.qLogErrors` (the live "which script is failing" board): raw
    * log lines stream in (file source tailing a log directory, or any
    * line shipper), the SAME ANSI-strip + regex parse runs inside the
    * micro-batch (`Logs.parseLines` — one shared transform, so streamed
    * and batch results cannot diverge), and per-(script, level) counts
    * accumulate as incremental partial aggregates. State is one row per
    * (script, level) — bounded by the script inventory, not log volume —
    * so complete-mode output stays KB-scale while any volume of lines
    * flows through. Malformed lines drop inside the micro-batch exactly
    * as in batch. */
  def logMonitor(rawLines: DataFrame): DataFrame =
    graft.operators.Logs.parseLines(rawLines)
      .groupBy(col("script"), col("level"))
      .agg(count(lit(1)).as("n_lines"))

  /** Streaming PII scrub — the online twin of `q_doc_pii`: documents
    * stream in as `doc_id|text` lines, the SAME `Pii.parseDocs` +
    * `Pii.scrub` transform (regex counts + chained redaction, malformed
    * lines drop in-batch) emits the redacted rows. COMPLETELY STATELESS
    * (one row in / one row out, append mode, no watermark, no state
    * store) — at ingest scale the scrubber is pure pass-through
    * throughput, parallel by partition. */
  def piiScrub(rawLines: DataFrame): DataFrame =
    graft.operators.Pii.scrub(graft.operators.Pii.parseDocs(rawLines))

  // ------------------------------------------------------- stateful sessions

  case class Evt(user_id: Long, event_id: Long, ts: Timestamp, value: Double) {
    def tsMicros: Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000
  }
  case class SessionState(start: Long, last: Long, n: Int, sumValue: Double)

  /** Micros-preserving Timestamp construction — `new Timestamp(us / 1000)`
    * would truncate to milliseconds and silently diverge from the batch twin
    * at sub-ms resolution. */
  private def tsFromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
  case class SessionOut(user_id: Long, sess_start: Timestamp, sess_end: Timestamp,
    n_events: Int, sum_value: Double)

  val GapMicros: Long = 30L * 60 * 1000000

  /** Gap-based sessionization with explicit keyed state
    * (flatMapGroupsWithState + event-time timeout): emits a session when a
    * 30-minute gap closes it or the watermark times the key out. The
    * streaming twin of the batch q_evt_sessionize. */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    val typed = events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[Evt]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Evt], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(userId, tsFromMicros(s.start), tsFromMicros(s.last),
                s.n, s.sumValue)).toIterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.tsMicros, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMicros - s.last <= GapMicros =>
                  cur = Some(s.copy(last = e.tsMicros, n = s.n + 1,
                    sumValue = s.sumValue + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, tsFromMicros(s.start),
                    tsFromMicros(s.last), s.n, s.sumValue)
                  cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // time the key out once the watermark passes the gap horizon
              state.setTimeoutTimestamp((s.last + GapMicros) / 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Watermarked stream-stream interval join: purchases matched to the same
    * user's signups within [signup, signup + 7d]. Both sides carry
    * watermarks and the join condition bounds event-time distance, so each
    * side's state store retains only the 7-day horizon — the bounded-state
    * form of streaming joins at scale. */
  def purchaseSignupJoin(purchases: DataFrame, signups: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val sgn = signups.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("s_user_id"), col("event_id").as("signup_id"),
        col("ts").as("signup_ts"))
    p.join(sgn,
      col("user_id") === col("s_user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"))
      .select(col("user_id"), col("purchase_id"), col("signup_id"),
        col("purchase_ts"), col("signup_ts"))
  }

  /** Watermarked stream-stream LEFT OUTER interval join — the conversion
    * funnel's complement: EVERY signup emits, matched to its user's
    * purchases within 7 days, or with a NULL purchase once the watermark
    * has passed the whole match window and proven no match can still
    * arrive. The null row emission is the semantically hard part of outer
    * streaming joins (an inner join just drops state; an outer join must
    * emit exactly once AT eviction) — state stays bounded at the same
    * 7-day horizon as the inner form above. */
  def signupPurchaseOuterJoin(signups: DataFrame,
      purchases: DataFrame): DataFrame = {
    val sgn = signups.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("signup_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    sgn.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"),
      "leftOuter")
      .select(col("user_id"), col("signup_id"), col("purchase_id"),
        col("signup_ts"), col("purchase_ts"))
  }

  case class EwmaState(mean: Double, varr: Double, n: Long)
  case class EwmaAlarm(event_type: String, event_id: Long, ts: Timestamp,
    value: Double, ewma: Double, band: Double)

  /** Streaming EWMA ANOMALY MONITOR — the live data-quality alarm over a
    * metric stream (the z-score query's continuous twin, but with
    * exponential forgetting so the baseline tracks drift): per key,
    * maintain an exponentially-weighted mean and variance of `value`;
    * a point outside mean ± k·σ BEFORE being folded in is an alarm row.
    * State is three numbers per key (bounded at the key cardinality —
    * the 100 TB shape); each micro-batch folds its rows in (ts,
    * event_id) order so the recurrence is deterministic and equals the
    * batch-computed recurrence (StreamsSpec proves both, including
    * across a batch split). `warmup` points must fold before the first
    * alarm can fire (a 2-point history has no variance to trust). */
  def ewmaAnomalies(spark: SparkSession, events: DataFrame,
      alpha: Double = 0.1, k: Double = 4.0,
      warmup: Long = 20): Dataset[EwmaAlarm] = {
    import spark.implicits._
    events.select(col("event_type"), col("event_id"), col("ts"), col("value"))
      .as[(String, Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val rows = it.toSeq.sortBy(r => (r._3.getTime, r._2))
          var st = state.getOption.getOrElse(EwmaState(0.0, 0.0, 0L))
          val alarms = Seq.newBuilder[EwmaAlarm]
          rows.foreach { case (_, id, ts, v) =>
            val band = k * math.sqrt(st.varr)
            if (st.n >= warmup && math.abs(v - st.mean) > band)
              alarms += EwmaAlarm(key, id, ts, v, st.mean, band)
            if (st.n == 0L) st = EwmaState(v, 0.0, 1L)
            else {
              val d = v - st.mean
              st = EwmaState(st.mean + alpha * d,
                (1 - alpha) * (st.varr + alpha * d * d), st.n + 1)
            }
          }
          state.update(st)
          alarms.result().iterator
      }
  }

  case class CusumState(s: Long, n: Long)
  case class CusumAlarm(user_id: Long, event_id: Long, ts: Timestamp,
    value: Double, cusum: Double)

  /** Streaming one-sided CUSUM drift monitor — the live twin of the
    * batch `q_evt_cusum`: per user, S ← max(0, S + (x − k)); every point
    * while S > h is an alarm row. The batch op centers on the user's
    * FULL-HISTORY mean (its prefix-sum closed form needs the whole
    * series); a live monitor cannot know that mean, so the streaming
    * form runs Page's original KNOWN-REFERENCE variant — k = baseline +
    * allowance with the baseline configured (the DAQ "monitor a channel
    * against its commissioning value" semantics). State is exact
    * integers (x scales to 1e-4 units, the batch op's discipline; S is
    * one Long), so a replayed micro-batch reproduces state bit-for-bit —
    * exactly-once across restarts with no float-order caveat, unlike the
    * EWMA monitor above. Two longs per user; rows fold in (ts, event_id)
    * order within each batch so the recurrence is deterministic. */
  def cusumAlarms(spark: SparkSession, events: DataFrame, refScaled: Long,
      allowScaled: Long, threshScaled: Long): Dataset[CusumAlarm] = {
    import spark.implicits._
    events
      // null values would make vi null and blow the non-nullable Long
      // encoder at runtime (the batch twin filters identically)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast("decimal(12,4)") * 10000).cast("long").as("vi"),
        col("value"))
      .as[(Long, Long, Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val rows = it.toSeq.sortBy(r => (r._3.getTime, r._2))
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val alarms = Seq.newBuilder[CusumAlarm]
          rows.foreach { case (_, id, ts, vi, v) =>
            val s1 = math.max(0L, st.s + (vi - refScaled - allowScaled))
            st = CusumState(s1, st.n + 1)
            if (s1 > threshScaled)
              alarms += CusumAlarm(key, id, ts, v, s1.toDouble / 10000.0)
          }
          state.update(st)
          alarms.result().iterator
      }
  }

  /** Late-arrival horizon for [[fanoMonitor]] (minutes retained per key
    * for in-place increments — the monitor's watermark analogue). */
  val FanoHorizonMinutes = 64L

  case class FanoState(open: Map[Long, Long], n: Long, sc2: Long,
    minM: Long, maxM: Long, occupied: Long,
    evictedUpTo: Long = Long.MinValue)
  case class FanoReport(event_type: String, n_events: Long,
    n_minutes: Long, n_occupied: Long, fano_scaled: Long, fano: Double)

  /** Streaming FANO-FACTOR (dispersion) monitor — the live twin of the
    * batch `q_evt_fano` Poisson-consistency audit: per event type,
    * maintain exact integer counting-process statistics (total events
    * n, Σc² over minute bins via the increment identity
    * (c+1)² − c² = 2c+1, bin span [minM, maxM], occupied-bin count) and
    * emit one report row per micro-batch with the same
    * (k·Σc² − n²)/((k−1)·n) dispersion the batch operator computes —
    * empty minutes counted implicitly, never materialized. State is a
    * handful of longs plus the open-minute map, BOUNDED by
    * [[FanoHorizonMinutes]] (older bins evict once their counts are
    * folded — an event arriving later than the horizon re-opens its bin
    * at zero, the documented late-data contract: sc2 restarts for that
    * bin, so the dispersion UNDER-reads relative to the batch twin.
    * n_occupied stays exact under the same contract: every evicted bin
    * was occupied (bins only exist once an event lands), so a re-open
    * at or below the eviction watermark does NOT re-increment occupied —
    * the only residual skew is a late FIRST-EVER event for an ancient
    * never-occupied minute, which under-counts by construction, the same
    * class as the sc2 restart. Within the horizon replay is bit-exact
    * like the CUSUM monitor. The report math runs
    * in BigInt on fold-side longs, so the emitted scaled value is the
    * exact integer floor — identical to the batch operator on the same
    * prefix. */
  def fanoMonitor(spark: SparkSession,
      events: DataFrame): Dataset[FanoReport] = {
    import spark.implicits._
    events
      .filter(col("ts").isNotNull)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"),
        col("event_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FanoState, FanoReport](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val rows = it.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(
            FanoState(Map.empty, 0L, 0L, Long.MaxValue, Long.MinValue, 0L))
          val open = scala.collection.mutable.Map[Long, Long](
            st.open.toSeq: _*)
          var (n, sc2, minM, maxM, occ) =
            (st.n, st.sc2, st.minM, st.maxM, st.occupied)
          var evictedUpTo = st.evictedUpTo
          rows.foreach { case (_, m, _) =>
            val c = open.getOrElse(m, 0L)
            // A re-open at/below the eviction watermark is a bin that
            // was already counted occupied before it evicted — only a
            // genuinely new minute increments occ (advisor r14 fix).
            if (c == 0L && m > evictedUpTo) occ += 1
            open(m) = c + 1
            sc2 += 2 * c + 1
            n += 1
            if (m < minM) minM = m
            if (m > maxM) maxM = m
          }
          val evictBelow = maxM - FanoHorizonMinutes
          val kept = open.filter { case (m, _) => m >= evictBelow }.toMap
          if (kept.size < open.size && evictBelow - 1 > evictedUpTo)
            evictedUpTo = evictBelow - 1
          state.update(
            FanoState(kept, n, sc2, minM, maxM, occ, evictedUpTo))
          val k = maxM - minM + 1
          if (n == 0L || k < 2) Iterator.empty
          else {
            val fs = (BigInt(1000000) * (BigInt(k) * sc2 - BigInt(n) * n) /
              (BigInt(k - 1) * n)).toLong
            Iterator.single(FanoReport(key, n, k, occ, fs,
              fs.toDouble / 1000000.0))
          }
      }
  }

  case class RateState(n: Long, firstUs: Long, lastUs: Long,
    maxGap: Long, minGap: Long)
  case class RateReport(event_type: String, n_events: Long,
    sum_dt_us: Long, max_gap_us: Long, min_gap_us: Long,
    rate_scaled: Long, rate_per_sec: Double)

  /** Streaming INTERARRIVAL-RATE monitor — the live twin of
    * `q_evt_rate`: per event type, exact integer state (count,
    * first/last timestamp, extreme gaps — five longs), one report row
    * per micro-batch with the same closed-form exponential-MLE rate
    * λ̂ = gaps/Σdt the batch operator computes (Σdt telescopes to
    * last − first, so it is never accumulated). Rows fold in (ts,
    * event_id) order within each batch; the cross-batch contract is the
    * CUSUM monitor's: per-type event time must not regress across
    * batches (an out-of-order arrival would fabricate a negative gap —
    * it is folded but clamps the gap stats, documented). The report math
    * runs in BigInt on fold-side longs — exact, identical to the batch
    * operator on the same prefix. */
  def rateMonitor(spark: SparkSession,
      events: DataFrame): Dataset[RateReport] = {
    import spark.implicits._
    events
      .filter(col("ts").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RateState, RateReport](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val rows = it.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(
            RateState(0L, Long.MaxValue, Long.MinValue,
              Long.MinValue, Long.MaxValue))
          rows.foreach { case (_, us, _) =>
            if (st.n > 0L) {
              val gap = us - st.lastUs
              st = st.copy(maxGap = math.max(st.maxGap, gap),
                minGap = math.min(st.minGap, gap))
            }
            st = st.copy(n = st.n + 1,
              firstUs = math.min(st.firstUs, us),
              lastUs = math.max(st.lastUs, us))
          }
          state.update(st)
          val sumDt = st.lastUs - st.firstUs
          if (st.n < 2 || sumDt <= 0) Iterator.empty
          else {
            val rs = (BigInt("1000000000000") * (st.n - 1) / sumDt).toLong
            Iterator.single(RateReport(key, st.n, sumDt, st.maxGap,
              st.minGap, rs, rs.toDouble / 1000000.0))
          }
      }
  }

  case class BurstState(open: Map[Long, Long], n: Long,
    bestCount: Long, bestMinute: Long,
    finalizedUpTo: Long, evictedUpTo: Long)
  case class BurstReport(event_type: String, n_events: Long,
    peak_count: Long, peak_minute: Long)

  /** Streaming PEAK-RATE / BURST monitor — the live twin of the batch
    * `q_evt_burst` worst-[[graft.operators.Events.BurstWindowMin]]-minutes
    * readout: per event type, maintain minute-bin counts (the fanoMonitor
    * state discipline — horizon-bounded open map, eviction watermark) and
    * emit per micro-batch the maximum sliding-window event count over all
    * windows ENDING at an occupied minute plus the EARLIEST such minute,
    * exactly the batch operator's (peak_count, peak_minute). Two-tier
    * exactness: window ends at-or-below the FINALIZATION watermark fold
    * into a frozen (best count, earliest minute) pair BEFORE their bins
    * can evict (ends ≤ cutoff+window−1 may need evicted bins, so they
    * finalize first — the freeze-then-evict order is what makes eviction
    * sound); ends above it recompute per batch from the open bins, which
    * are all still present. Ties prefer the earlier minute: frozen ends
    * precede every live end by construction, so the frozen pair wins
    * equalities. Late-data contract (the fanoMonitor one, one window
    * wider): an event for a minute at-or-below the finalization
    * watermark folds into n_events and its bin, but its already-frozen
    * window sums do not reopen — the peak UNDER-reads relative to the
    * batch twin; within the horizon replay is bit-exact across any batch
    * split. State: the open-minute map plus four longs. */
  def burstMonitor(spark: SparkSession,
      events: DataFrame): Dataset[BurstReport] = {
    import spark.implicits._
    val win = graft.operators.Events.BurstWindowMin.toLong
    events
      .filter(col("ts").isNotNull)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"),
        col("event_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BurstState, BurstReport](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val rows = it.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(BurstState(Map.empty, 0L,
            0L, Long.MinValue, Long.MinValue, Long.MinValue))
          val open = scala.collection.mutable.Map[Long, Long](
            st.open.toSeq: _*)
          var n = st.n
          rows.foreach { case (_, m, _) =>
            open(m) = open.getOrElse(m, 0L) + 1L
            n += 1
          }
          val maxM = (open.keysIterator ++ Iterator.single(Long.MinValue)).max
          // window sum ending at e over the open bins (absent bins are 0)
          def wsum(e: Long): Long =
            (0L until win).map(i => open.getOrElse(e - i, 0L)).sum
          var (bestC, bestM) = (st.bestCount, st.bestMinute)
          // freeze-then-evict: finalize every occupied end that the next
          // eviction could starve of its trailing bins
          val evictBelow = maxM - FanoHorizonMinutes
          val finalizeTo = evictBelow + win - 1
          if (finalizeTo > st.finalizedUpTo) {
            open.keysIterator
              .filter(e => e > st.finalizedUpTo && e <= finalizeTo)
              .toSeq.sorted
              .foreach { e =>
                val c = wsum(e)
                if (c > bestC) { bestC = c; bestM = e }
              }
            st = st.copy(finalizedUpTo = finalizeTo)
          }
          val kept = open.filter { case (m, _) => m >= evictBelow }.toMap
          val newEvicted =
            if (kept.size < open.size && evictBelow - 1 > st.evictedUpTo)
              evictBelow - 1 else st.evictedUpTo
          state.update(BurstState(kept, n, bestC, bestM,
            st.finalizedUpTo, newEvicted))
          if (n == 0L) Iterator.empty
          else {
            // live tier: ends above the finalization watermark, all bins
            // present — recomputed per batch, never frozen
            var (pc, pm) = (bestC, bestM)
            open.keysIterator.filter(_ > st.finalizedUpTo).toSeq.sorted
              .foreach { e =>
                val c = wsum(e)
                if (c > pc) { pc = c; pm = e }
              }
            Iterator.single(BurstReport(key, n, pc, pm))
          }
      }
  }

  case class MadState(counts: Map[Long, Long])
  case class MadReport(event_type: String, n_events: Long,
    med2: Long, mad2: Long, n_outliers: Long,
    median_value: Double, mad_value: Double)

  /** Streaming ROBUST-OUTLIER (median/MAD, Hampel) monitor — the live
    * twin of the batch `q_evt_mad`: per event type, the state is the
    * exact per-quantized-value COUNT MAP (the same distinct-value-bounded
    * relation the batch operator pivots on — state is O(distinct
    * DECIMAL(12,4) values per type), value-bounded rather than
    * time-bounded, so there is NO late-data horizon: every arrival folds
    * exactly and replay is bit-identical across any batch split, no
    * contract caveats). Per micro-batch the monitor replays the batch
    * closed forms over the map — doubled median x_{(n+1)÷2} + x_{(n+2)÷2}
    * via the running-sum selection, deviation counts, doubled MAD, and
    * the integer cross-multiply Hampel gate 2d > 3·mad2 — all in exact
    * longs, emitting the identical (n_events, med2, mad2, n_outliers)
    * report. For value domains with unbounded cardinality the map grows
    * with distinct values — the identical bound the batch relation
    * carries, documented here rather than silently sketched. */
  def madMonitor(spark: SparkSession,
      events: DataFrame): Dataset[MadReport] = {
    import spark.implicits._
    def med2Of(counts: Map[Long, Long]): Long = {
      val n = counts.valuesIterator.sum
      val k1 = (n + 1) / 2
      val k2 = (n + 2) / 2
      var cum = 0L; var m = 0L
      counts.toSeq.sortBy(_._1).foreach { case (v, c) =>
        val prev = cum; cum += c
        if (prev < k1 && k1 <= cum) m += v
        if (prev < k2 && k2 <= cum) m += v
      }
      m
    }
    events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(12,4)") * 10000).cast("long").as("v4"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MadState, MadReport](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val counts = scala.collection.mutable.Map[Long, Long](
            state.getOption.map(_.counts.toSeq).getOrElse(Nil): _*)
          it.foreach { case (_, v) =>
            counts(v) = counts.getOrElse(v, 0L) + 1L }
          state.update(MadState(counts.toMap))
          val n = counts.valuesIterator.sum
          if (n == 0L) Iterator.empty
          else {
            val med2 = med2Of(counts.toMap)
            val dev = counts.toSeq
              .groupBy { case (v, _) => math.abs(2 * v - med2) }
              .map { case (dv, xs) => dv -> xs.map(_._2).sum }
            val mad2 = med2Of(dev)
            val outl = dev.collect {
              case (dv, c) if 2 * dv > 3 * mad2 => c }.sum
            Iterator.single(MadReport(key, n, med2, mad2, outl,
              med2.toDouble / 20000.0, mad2.toDouble / 40000.0))
          }
      }
  }

  /** Stream-static enrichment: the event stream joined against a static
    * readout-map dim (cf. the dromap join, §2.B) — Spark broadcasts the
    * static side into every micro-batch; no stream-side state. */
  def enrichWithMap(events: DataFrame, dromap: DataFrame): DataFrame =
    events.join(broadcast(dromap), "event_type")

  /** Live run-stamping: the event stream time-range-joined against the
    * static AUTHORITATIVE runs dimension (graft.operators.Runs) — each
    * event carries its run_number/config_name as it arrives; events in
    * inter-run gaps drop, exactly like the batch q_runs_auth. The dim is
    * KB-scale control-plane data, broadcast into every micro-batch as a
    * nested-loop range join; no stream-side state. Downstream a per-run
    * windowed agg gives the live run summary. */
  def stampWithRun(events: DataFrame, runsDim: DataFrame): DataFrame =
    events.join(broadcast(runsDim),
      events("ts") >= runsDim("start_ts") && events("ts") < runsDim("stop_ts"))
      .drop("start_ts", "stop_ts", "purpose")

  /** Streaming → lake sink via foreachBatch: each micro-batch lands as
    * date/hour-partitioned parquet (the DAQ dropbox → lake hop). foreachBatch
    * is the escape hatch for sinks that need batch-writer features
    * (partitionBy, dynamic overwrite) not exposed on writeStream. */
  def sinkToLake(events: DataFrame, outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("event_date", to_date(col("ts")))
          .withColumn("event_hour", hour(col("ts")))
          .write
          .partitionBy("event_date", "event_hour")
          .mode("append")
          .parquet(outDir)
      }

  /** File-source streaming ingest over an events directory — at scale this
    * is the dropbox the DAQ file mover lands parquet into
    * (cf. file_transfer_scripts/createMetadatafiles_iceberg_dropbox.sh). */
  def readEventStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(dir)

  case class ChgptState(counts: Map[Long, Long])
  case class ChgptReport(event_type: String, n_events: Long,
    split_minute: Long, n_left: Long, n_right: Long,
    llr_scaled: Long, llr: Double)

  /** Streaming CHANGEPOINT monitor — the live twin of the batch
    * `q_evt_changepoint`: per event type the state is the exact
    * per-MINUTE count map (minute-bounded, the madMonitor value-bounded
    * discipline: NO late-data horizon, bit-identical replay under any
    * micro-batch split — a late event simply lands in its minute and
    * the next report reflects it); each batch replays the batch
    * operator's quantized-ln closed form over the map — L(x) =
    * floor(1e6·ln x) on integers only, BIGINT products, earliest-
    * boundary ties — so the final report is BIT-EQUAL to the batch
    * query over the same events (spec-pinned). State is O(span
    * minutes) per type: bounded by wall-clock coverage (1440/day), not
    * event volume. */
  def changepointMonitor(spark: SparkSession,
      events: DataFrame): Dataset[ChgptReport] = {
    import spark.implicits._
    def L(x: Long): Long = math.floor(1e6 * math.log(x.toDouble)).toLong
    events.filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ChgptState, ChgptReport](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val counts = scala.collection.mutable.Map[Long, Long](
            state.getOption.map(_.counts.toSeq).getOrElse(Nil): _*)
          it.foreach { case (_, m) =>
            counts(m) = counts.getOrElse(m, 0L) + 1L }
          state.update(ChgptState(counts.toMap))
          val ms = counts.keys.toSeq.sorted
          if (ms.size < 2) Iterator.empty
          else {
            val m0 = ms.head; val mT = ms.last
            val w = mT - m0 + 1
            val n = counts.valuesIterator.sum
            var cum = 0L
            var bestScore = Long.MinValue; var bestM = 0L; var bestN1 = 0L
            ms.foreach { m =>
              cum += counts(m)
              if (m < mT) {
                val t = m - m0 + 1
                val n1 = cum; val n2 = n - cum
                val score = n1 * L(n1) - n1 * L(t) +
                  (if (n2 > 0) n2 * L(n2) - n2 * L(w - t) else 0L)
                if (score > bestScore) { // strict: earliest tie wins
                  bestScore = score; bestM = m; bestN1 = n1
                }
              }
            }
            val llrS = bestScore - (n * L(n) - n * L(w))
            Iterator.single(ChgptReport(key, n, bestM, bestN1,
              n - bestN1, llrS, llrS.toDouble / 1000000.0))
          }
      }
  }

  case class HHState(n: Long, est: Map[Long, Long], err: Map[Long, Long])
  case class HHReport(event_type: String, n_events: Long, item: Long,
    est: Long, err: Long, guaranteed: Boolean)

  /** STREAMING HEAVY HITTERS — Space-Saving (Metwally, Agrawal &
    * El Abbadi 2005), the standard bounded-memory frequent-items
    * summary: per event type, a capacity-`k` counter table where an
    * untracked arrival EVICTS the minimum counter and inherits its
    * count as its error bound. Published guarantees, both proven by the
    * spec against exact batch counts for ANY arrival order: every item
    * with true frequency > n/k is tracked, and for each tracked item
    * est − err ≤ true ≤ est. `guaranteed` flags items whose LOWER
    * bound already exceeds n/k — certainly heavy, not an artifact of
    * eviction inheritance. Eviction ties break by (count, item) —
    * deterministic; the summary is order-dependent ACROSS different
    * interleavings (the algorithm's published nature) but identical for
    * the same arrival order under any micro-batch split. State is O(k)
    * per event type — bounded at any stream length; a per-batch report
    * emits the current top-`top` (Append mode, no late-data horizon:
    * arrival order, not event time, defines the summary). */
  def heavyHittersMonitor(spark: SparkSession, events: DataFrame,
      k: Int = 8, top: Int = 5): Dataset[HHReport] = {
    import spark.implicits._
    events
      .filter(col("event_type").isNotNull && col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").as("item"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HHState, HHReport](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val s0 = state.getOption
            .getOrElse(HHState(0L, Map.empty, Map.empty))
          val est = scala.collection.mutable.Map(s0.est.toSeq: _*)
          val err = scala.collection.mutable.Map(s0.err.toSeq: _*)
          var n = s0.n
          it.foreach { case (_, item) =>
            n += 1
            if (est.contains(item)) est(item) += 1L
            else if (est.size < k) { est(item) = 1L; err(item) = 0L }
            else {
              val (mItem, mCnt) = est.toSeq
                .minBy { case (i, c) => (c, i) }
              est.remove(mItem); err.remove(mItem)
              est(item) = mCnt + 1L; err(item) = mCnt
            }
          }
          state.update(HHState(n, est.toMap, err.toMap))
          if (n == 0L) Iterator.empty
          else est.toSeq.sortBy { case (i, c) => (-c, i) }.take(top)
            .iterator.map { case (i, c) =>
              HHReport(key, n, i, c, err(i), (c - err(i)) * k > n) }
      }
  }
}
