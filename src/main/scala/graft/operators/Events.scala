package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.B — event-stream analytics, the batch analog of the reference's DAQ
  * ingest path (cf. /root/reference/run/run_iceberg_daq.sh — fixed-rate
  * event streams; config/base/dromaps — src→geo enrichment;
  * file_transfer_scripts/insert_extra_fields.py — integrity metadata).
  *
  * The `events` parquet has carried its timestamps in two physical forms
  * across driver data generations — TIMESTAMP(NANOS) (which Spark's parquet
  * reader rejects by default) and TIMESTAMP(MICROS) — so the loader
  * dispatches on the READ SCHEMA rather than assuming either:
  * nanos read as epoch-nanos longs (spark.sql.legacy.parquet.nanosAsLong)
  * truncate to microseconds, bit-identical to how DuckDB coerces ns→µs;
  * micros arrive as TIMESTAMP_NTZ and only need the NTZ→LTZ cast (identity
  * on the stored micros under the UTC session both engines run).
  */
object Events {

  /** events with `ts` as a proper µs TIMESTAMP, whichever physical form the
    * file carries. For NANOS files this requires
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session
    * construction (GraftSession / the tool mains) — a table loader must not
    * mutate session conf as a side effect. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.events(s, d)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,4)")

  /** Tumbling 1-hour window aggregation — the batch twin of the streaming
    * ingest agg (§2.F). Epoch-aligned tumbling window ≡ date_trunc('hour'). */
  def qEvtTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  def qEvtTumblingSql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      | count(*) AS n_events,
      | CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-min inactivity gap) composed from lag +
    * running sum — one shuffle on user_id, deterministic tiebreaks. */
  def qEvtSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"))
  }

  def qEvtSessionizeSql: String =
    """WITH flagged AS (
      | SELECT user_id, event_id, ts,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
      |       THEN 1 ELSE 0 END AS new_sess
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      | SELECT user_id, ts,
      |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      | min(ts) AS sess_start, max(ts) AS sess_end
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  /** As-of join composed from an ignore-nulls running max over a window that
    * excludes the current row: each purchase gets the user's most recent
    * strictly-prior signup. No O(n²) range join, one shuffle on user_id. */
  def qEvtAsof(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("last_signup_ts",
        max(when(col("event_type") === "signup", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_signup_ts"))
  }

  def qEvtAsofSql: String =
    """SELECT event_id, user_id, ts, last_signup_ts FROM (
      | SELECT event_id, user_id, ts, event_type,
      |  max(CASE WHEN event_type = 'signup' THEN ts END) OVER
      |   (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_ts
      | FROM events WHERE event_type IN ('signup', 'purchase')) t
      |WHERE event_type = 'purchase'""".stripMargin

  /** Keep-latest-per-key dedup — the trigger-record dedup pattern
    * (row_number over a desc-ordered per-key window). */
  def qEvtDedupLatest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
  }

  def qEvtDedupLatestSql: String =
    """SELECT event_id, user_id, event_type, ts, value FROM (
      | SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events) t WHERE rn = 1""".stripMargin

  /** JSON sidecar-metadata extraction + aggregation (cf. the reference's
    * JSON metadata enrichment in insert_extra_fields.py). */
  def qEvtJson(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).cast("bigint").as("sum_k"),
        max(col("k")).as("max_k"))

  def qEvtJsonSql: String =
    """SELECT event_type, count(*) AS n_events,
      | CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events) t
      |GROUP BY event_type""".stripMargin

  /** Per-user profile aggregation. */
  def qEvtUserStats(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(dec(col("value"))).cast("double").as("total_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  def qEvtUserStatsSql: String =
    """SELECT user_id, count(*) AS n_events,
      | count(DISTINCT event_type) AS n_types,
      | CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value,
      | min(ts) AS first_ts, max(ts) AS last_ts
      |FROM events GROUP BY user_id""".stripMargin

  /** Broadcast readout-map enrichment: event_type → detector geography
    * (det_id, crate_id) — the dromap join pattern
    * (cf. config/base/dromaps/iceberg_dromap_wib_101.json geo_id fields).
    * The map is a handful of rows: always broadcast, never shuffled. */
  def qEvtGeoEnrich(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dromap = Seq(
      ("click", 3, 1), ("view", 3, 2), ("purchase", 3, 3),
      ("signup", 2, 1), ("error", 2, 2))
      .toDF("event_type", "det_id", "crate_id")
    events(s, d)
      .join(broadcast(dromap), "event_type")
      .groupBy(col("det_id"), col("crate_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
  }

  def qEvtGeoEnrichSql: String =
    """SELECT det_id, crate_id, count(*) AS n_events,
      | CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
      |FROM events JOIN (VALUES ('click',3,1),('view',3,2),('purchase',3,3),('signup',2,1),('error',2,2))
      | AS m(event_type, det_id, crate_id) USING (event_type)
      |GROUP BY det_id, crate_id""".stripMargin

  /** Sliding-window aggregation (1h window, 30min slide): each event lands
    * in 2 overlapping windows. Catalyst expands the window assignment
    * inline (no self-join); the oracle replicates it with an explicit
    * 2-offset cross join. */
  def qEvtSliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  def qEvtSlidingSql: String =
    """SELECT make_timestamp(((epoch_us(ts) // 1000000 // 1800) * 1800 - off) * 1000000) AS win_start,
      | event_type, count(*) AS n_events
      |FROM events CROSS JOIN (VALUES (0), (1800)) AS o(off)
      |WHERE epoch_us(ts) // 1000000 - (((epoch_us(ts) // 1000000 // 1800) * 1800) - off) < 3600
      |GROUP BY 1, 2""".stripMargin

  /** Gap-based sessions via Spark's native session_window (dynamic-gap
    * session windows in one groupBy — the declarative twin of
    * qEvtSessionize; both agree with the streaming version, see specs).
    * Session start = first event ts, identical to the lag/running-sum
    * formulation, which is what the shared oracle CTE computes. */
  def qEvtSessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("n_events"))

  def qEvtSessionWindowSql: String =
    // NOTE >=, not >: session_window is half-open [start, start+gap), so a
    // gap of EXACTLY 30 minutes starts a new session — the lag formulation
    // must match that boundary or an exact-gap pair breaks parity.
    """WITH flagged AS (
      | SELECT user_id, event_id, ts,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 30*60*1000000
      |       THEN 1 ELSE 0 END AS new_sess
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      | SELECT user_id, ts,
      |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      | FROM flagged)
      |SELECT user_id, min(ts) AS sess_start, count(*) AS n_events
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  /** Trailing moving average over each user's value series (3-row window) —
    * the waveform-smoothing primitive (cf. the reference's TPC stream
    * processing). Decimal window sum → double division keeps it
    * engine-exact. */
  def qEvtMovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        (sum(dec(col("value"))).over(w).cast("double") /
          count(lit(1)).over(w)).as("value_ma3"))
  }

  def qEvtMovingAvgSql: String =
    """SELECT event_id, user_id, ts,
      | CAST(sum(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE) / count(*) OVER w AS value_ma3
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Trailing ONE-HOUR window per user — a TIME-based (RANGE) frame, the
    * companion to the row-based ma3: for each event, how many events and
    * how much value this user produced in the preceding hour INCLUDING
    * now (rate limiting / burst detection). The frame is RANGE over exact
    * epoch MICROS (`unix_micros` ↔ DuckDB `epoch_us` — integer on both
    * engines, no double epoch seconds whose cast rounds differently), so
    * tie rows (equal timestamps) enter the frame identically everywhere.
    * Scale: one shuffle partitioned by user; frame state is bounded by
    * each user's 1-hour event rate, independent of corpus size. */
  def qEvtTrailing1h(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000, Window.currentRow)
    events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        sum(dec(col("value"))).over(w).cast("double").as("sum_1h"))
  }

  def qEvtTrailing1hSql: String =
    """SELECT event_id, user_id, ts,
      | CAST(count(*) OVER w AS BIGINT) AS n_1h,
      | CAST(sum(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE) AS sum_1h
      |FROM (SELECT *, epoch_us(ts) AS ts_us FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Statistical outlier detection: events whose value sits more than 3
    * standard deviations from the event-type mean — the DAQ
    * anomalous-channel flagging pattern. Mean and variance computed in
    * exact decimal arithmetic (E[x²]−E[x]²) so the z-threshold is
    * bit-identical on every engine; output is ids only. */
  def qEvtZscore(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val stats = e.groupBy(col("event_type")).agg(
      (sum(dec(col("value"))).cast("double") / count(lit(1))).as("mean"),
      sqrt(
        (sum(dec(col("value")) * dec(col("value"))).cast("double") / count(lit(1))) -
          (sum(dec(col("value"))).cast("double") / count(lit(1))) *
          (sum(dec(col("value"))).cast("double") / count(lit(1)))).as("sd"))
    e.join(broadcast(stats), "event_type")
      .filter(abs(col("value") - col("mean")) > col("sd") * 3)
      .select(col("event_id"), col("event_type"), col("value"))
  }

  def qEvtZscoreSql: String =
    """WITH stats AS (
      | SELECT event_type,
      |  CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / count(*) AS mean,
      |  sqrt(
      |   CAST(sum(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4))) AS DOUBLE) / count(*) -
      |   (CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / count(*)) *
      |   (CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / count(*))) AS sd
      | FROM events GROUP BY event_type)
      |SELECT event_id, event_type, value
      |FROM events JOIN stats USING (event_type)
      |WHERE abs(value - mean) > sd * 3""".stripMargin

  /** ROBUST (median/MAD) OUTLIER REPORT — the heavy-tail-safe twin of
    * [[qEvtZscore]] (mean/σ break on the very outliers they hunt; the
    * Hampel rule |x − med| > 3·MAD is the standard robust gate): per
    * event_type, the exact median, the exact median absolute
    * deviation, and the outlier count.
    *
    * NO interpolation anywhere — the cross-engine trap in quantiles is
    * the lerp arithmetic, so both statistics are pure ORDER
    * STATISTICS kept in integers: values scale exactly to BIGINT
    * v4 = value·10⁴ (≤4-dp values, the q_evt_zscore decimal
    * discipline); the doubled median med2 = x₍(n+1)÷2₎ + x₍(n+2)÷2₎
    * (odd n counts the middle twice); deviations d = |2·v4 − med2| are
    * exact BIGINTs; mad2 = the doubled median of d (= 4·MAD·10⁴); and
    * the Hampel rule |x−med| > 3·MAD becomes the integer compare
    * 2·d > 3·mad2. The reported double median/mad are single divisions
    * of exact integers.
    *
    * Scale shape: medians select WITHOUT a corpus-sized sort — per
    * (type, v4) counts map-side combine to a DISTINCT-VALUE relation
    * (bounded by the 4-dp value space, not the corpus), a running-sum
    * window over that bounded relation locates the middle positions
    * (x₍k₎ covered ⟺ cum−c < k ≤ cum), and the deviation median
    * reuses the same counts re-keyed by d — the exact-median shape for
    * discrete-valued data; a per-type window over raw events would
    * instead drag each type into one task. */
  def qEvtMad(s: SparkSession, d: String): DataFrame = {
    val vc = events(s, d)
      .select(col("event_type"),
        (dec(col("value")) * 10000).cast("long").as("v4"))
      .groupBy(col("event_type"), col("v4")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // distinct-value-bounded; ONE events scan feeds
      //                    the median, deviation, MAD, and outlier passes
    def med2Of(counts: DataFrame, key: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      counts
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(wAll))
        .withColumn("k1", expr("(n + 1) DIV 2"))
        .withColumn("k2", expr("(n + 2) DIV 2"))
        .withColumn("m2",
          when(col("cum") - col("c") < col("k1") && col("k1") <= col("cum"),
            col(key)).otherwise(lit(0L)) +
            when(col("cum") - col("c") < col("k2") && col("k2") <= col("cum"),
              col(key)).otherwise(lit(0L)))
        .groupBy(col("event_type"))
        .agg(sum(col("m2")).cast("long").as("med2"),
          max(col("n")).cast("long").as("n"))
    }
    val med = med2Of(vc, "v4")
    val dev = vc.join(med.select(col("event_type"), col("med2")), "event_type")
      .select(col("event_type"),
        abs(lit(2) * col("v4") - col("med2")).as("dv"), col("c"))
      .groupBy(col("event_type"), col("dv")).agg(sum(col("c")).as("c"))
      .localCheckpoint() // feeds the MAD selection AND the outlier count
    val mad = med2Of(dev, "dv")
      .select(col("event_type"), col("med2").as("mad2"))
    val outliers = dev.join(mad, "event_type")
      .filter(lit(2) * col("dv") > lit(3) * col("mad2"))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).cast("long").as("n_outliers"))
    med.join(mad, "event_type")
      .join(outliers, Seq("event_type"), "left")
      .select(col("event_type"), col("n").as("n_events"),
        col("med2"), col("mad2"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"),
        (col("med2").cast("double") / lit(20000.0)).as("median_value"),
        (col("mad2").cast("double") / lit(40000.0)).as("mad_value"))
  }

  def qEvtMadSql: String =
    """WITH vc AS MATERIALIZED (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS BIGINT) AS v4,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), med AS MATERIALIZED (
      |  SELECT event_type, CAST(sum(m2) AS BIGINT) AS med2,
      |    CAST(max(n) AS BIGINT) AS n
      |  FROM (
      |    SELECT event_type, n,
      |      CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
      |        THEN v4 ELSE 0 END +
      |      CASE WHEN cum - c < (n + 2) // 2 AND (n + 2) // 2 <= cum
      |        THEN v4 ELSE 0 END AS m2
      |    FROM (
      |      SELECT event_type, v4, c,
      |        sum(c) OVER (PARTITION BY event_type ORDER BY v4
      |          ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY event_type) AS n
      |      FROM vc) x) y
      |  GROUP BY event_type
      |), dev AS MATERIALIZED (
      |  SELECT event_type, abs(2 * v4 - med2) AS dv,
      |    CAST(sum(c) AS BIGINT) AS c
      |  FROM vc JOIN med USING (event_type)
      |  GROUP BY 1, 2
      |), mad AS MATERIALIZED (
      |  SELECT event_type, CAST(sum(m2) AS BIGINT) AS mad2
      |  FROM (
      |    SELECT event_type,
      |      CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
      |        THEN dv ELSE 0 END +
      |      CASE WHEN cum - c < (n + 2) // 2 AND (n + 2) // 2 <= cum
      |        THEN dv ELSE 0 END AS m2
      |    FROM (
      |      SELECT event_type, dv, c,
      |        sum(c) OVER (PARTITION BY event_type ORDER BY dv
      |          ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY event_type) AS n
      |      FROM dev) x) y
      |  GROUP BY event_type
      |), outl AS (
      |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_outliers
      |  FROM dev JOIN mad USING (event_type)
      |  WHERE 2 * dv > 3 * mad2
      |  GROUP BY event_type
      |)
      |SELECT event_type, n AS n_events, med2, mad2,
      |  COALESCE(n_outliers, 0) AS n_outliers,
      |  CAST(med2 AS DOUBLE) / CAST(20000 AS DOUBLE) AS median_value,
      |  CAST(mad2 AS DOUBLE) / CAST(40000 AS DOUBLE) AS mad_value
      |FROM med JOIN mad USING (event_type)
      |LEFT JOIN outl USING (event_type)""".stripMargin

  /** LAG-1 AUTOCORRELATION per user series — the periodicity /
    * baseline-drift QA signal (white noise ⇒ r₁ ≈ 0; a drifting or
    * oscillating channel shows |r₁| ≫ 0; Box–Jenkins' first
    * diagnostic): r₁ = Σ(x_t−μ)(x_{t+1}−μ) / Σ(x_t−μ)², kept
    * cross-engine EXACT by the CUSUM n-multiplication rule — with
    * v = value·10⁴ BIGINT and S = Σv, every centered term is the exact
    * integer n·v_t − S, so numerator and denominator are exact
    * DECIMAL(38,0)/HUGEINT sums (bound n³·max|v|² ≈ 1e29 at the 2e4
    * events/user CUSUM envelope — inside 38 digits) and the reported
    * ratio is the integer floor (1e6·num) DIV den (truncation toward
    * zero on BOTH engines — the money-path rule); its double form is
    * exact (|r₁_scaled| ≤ 1e6).
    *
    * Scale shape: ONE user_id exchange shared by the stats window and
    * the lead pass (the CUSUM discipline), then a per-user aggregate of
    * decimal partial sums. Per-user frames are history-bounded. */
  def qEvtAutocorr(s: SparkSession, d: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    events(s, d)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        (dec(col("value")) * 10000).cast("long").as("v"))
      .withColumn("n", count(lit(1)).over(wu))
      .withColumn("sv", sum(col("v")).over(wu))
      .withColumn("c", d38(col("n") * col("v") - col("sv")))
      .withColumn("cn", lead(col("c"), 1).over(wo))
      .groupBy(col("user_id"))
      .agg(max(col("n")).cast("long").as("n_events"),
        sum(col("c") * col("c")).as("den"),
        sum(when(col("cn").isNotNull, col("c") * col("cn"))
          .otherwise(d38(lit(0)))).as("num"))
      .filter(col("den") =!= 0) // constant series: r1 undefined, dropped
      .select(col("user_id"), col("n_events"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * num DIV den AS BIGINT)")
          .as("r1_scaled"))
      .withColumn("r1", col("r1_scaled").cast("double") / lit(1000000.0))
  }

  def qEvtAutocorrSql: String =
    """WITH v AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL
      |), c0 AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
      |    CAST(CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) * v
      |      - CAST(sum(v) OVER (PARTITION BY user_id) AS BIGINT)
      |      AS HUGEINT) AS c
      |  FROM v
      |), c AS (
      |  SELECT user_id, n, c,
      |    lead(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cn
      |  FROM c0
      |), a AS (
      |  SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
      |    sum(c * c) AS den,
      |    sum(CASE WHEN cn IS NOT NULL THEN c * cn ELSE 0::HUGEINT END)
      |      AS num
      |  FROM c GROUP BY user_id
      |)
      |SELECT user_id, n_events,
      |  CAST(CAST(1000000 AS HUGEINT) * num // den AS BIGINT) AS r1_scaled,
      |  CAST(CAST(CAST(1000000 AS HUGEINT) * num // den AS BIGINT)
      |    AS DOUBLE) / CAST(1000000 AS DOUBLE) AS r1
      |FROM a WHERE den <> 0""".stripMargin

  /** Local-maximum detection in each user's value series — the trigger-
    * candidate (peak-finding) primitive of a DAQ readout chain. */
  def qEvtPeaks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_v", lag(col("value"), 1).over(w))
      .withColumn("next_v", lead(col("value"), 1).over(w))
      .filter(col("prev_v").isNotNull && col("next_v").isNotNull &&
        col("value") > col("prev_v") && col("value") > col("next_v"))
      .select(col("event_id"), col("user_id"), col("value"))
  }

  def qEvtPeaksSql: String =
    """SELECT event_id, user_id, value FROM (
      | SELECT event_id, user_id, value,
      |  lag(value) OVER w AS prev_v, lead(value) OVER w AS next_v
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      |WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
      |  AND value > prev_v AND value > next_v""".stripMargin

  /** Conversion funnel: per user, did a signup precede the first purchase?
    * One shuffle on user_id; conditional min aggregates, no self-join. */
  def qEvtFunnel(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"),
        count(lit(1)).as("n_events"))
      .withColumn("converted",
        col("first_signup").isNotNull && col("first_purchase").isNotNull &&
          col("first_signup") < col("first_purchase"))

  def qEvtFunnelSql: String =
    """SELECT user_id, first_signup, first_purchase, n_events,
      | (first_signup IS NOT NULL AND first_purchase IS NOT NULL
      |  AND first_signup < first_purchase) AS converted
      |FROM (SELECT user_id,
      |  min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
      |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase,
      |  count(*) AS n_events
      | FROM events GROUP BY user_id) t""".stripMargin

  /** Ingest-integrity checksums per event_type (cf. insert_extra_fields.py's
    * adler32-per-file): Adler-32 of each payload via the native codegen
    * expression (graft.functions.Adler32), aggregated order-insensitively.
    * Oracle-checked: DuckDB has no adler32 builtin, but Adler-32 has a
    * CLOSED FORM over the byte sequence — a = (1 + Σbⱼ) mod 65521,
    * b = (n + Σ(n−j+1)·bⱼ) mod 65521 — expressible as plain SQL over
    * ascii(substr(...)) for ASCII payloads (the props column is ASCII
    * JSON; Spark's UTF-8 cast yields the same bytes). */
  def qEvtChecksum(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("adler", graft.functions.GraftFunctions.adler32(col("props").cast("binary")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("adler")).as("sum_adler"),
        max(col("adler")).as("max_adler"))

  def qEvtChecksumSql: String =
    """WITH agg AS (
      |  SELECT event_id,
      |    sum((len(props) - i + 1) * ascii(substr(props, i, 1))) AS wsum,
      |    sum(ascii(substr(props, i, 1))) AS bsum
      |  FROM events, unnest(range(1, len(props) + 1)) AS r(i)
      |  GROUP BY event_id),
      |per AS (
      |  SELECT e.event_type,
      |    ((len(e.props) + coalesce(a.wsum, 0)) % 65521) * 65536
      |      + (1 + coalesce(a.bsum, 0)) % 65521 AS adler
      |  FROM events e LEFT JOIN agg a ON e.event_id = a.event_id)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(adler) AS BIGINT) AS sum_adler,
      |  CAST(max(adler) AS BIGINT) AS max_adler
      |FROM per GROUP BY event_type""".stripMargin

  /** OCCUPANCY MAP — the DAQ monitoring staple: event counts per
    * (detector, crate, hour-of-day) cell, the 2-D histogram every shifter
    * watches for hot/dead channels. One broadcast dim join + one two-phase
    * aggregation; the cell space is bounded (dets × crates × 24) no matter
    * the event volume. */
  def qEvtOccupancy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dromap = Seq(
      ("click", 3, 1), ("view", 3, 2), ("purchase", 3, 3),
      ("signup", 2, 1), ("error", 2, 2))
      .toDF("event_type", "det_id", "crate_id")
    events(s, d)
      .join(broadcast(dromap), "event_type")
      .groupBy(col("det_id"), col("crate_id"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_channels"))
  }

  def qEvtOccupancySql: String =
    """WITH dromap(event_type, det_id, crate_id) AS (VALUES
      |  ('click', 3, 1), ('view', 3, 2), ('purchase', 3, 3),
      |  ('signup', 2, 1), ('error', 2, 2))
      |SELECT m.det_id, m.crate_id, CAST(hour(e.ts) AS INT) AS hod,
      |  count(*) AS n_events,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_channels
      |FROM events e JOIN dromap m ON e.event_type = m.event_type
      |GROUP BY m.det_id, m.crate_id, hour(e.ts)""".stripMargin

  /** DEAD-TIME detection — the DAQ uptime metric: minutes inside the run
    * span in which NO event of any type arrived (trigger inhibit / DAQ
    * stall windows). Scale-safe formulation: events collapse to distinct
    * present-minutes (two-phase agg), the minute DIMENSION is generated
    * from the global [min, max] span (time-bounded: 30 days = 43 k rows
    * regardless of event volume) and anti-joined against presence — never
    * a single-partition lag over the raw stream. Output: per day, how many
    * dead minutes. */
  def qEvtDeadtime(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(floor(unix_timestamp(col("ts")) / 60).as("m"))
    val bounds = ev.agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
    val minutes = bounds.select(explode(sequence(col("lo"), col("hi"))).as("m"))
    minutes.join(ev.distinct(), Seq("m"), "left_anti")
      .groupBy(to_date(timestamp_seconds(col("m") * 60)).as("day"))
      .agg(count(lit(1)).as("n_dead_minutes"))
  }

  // day bucketing via make_timestamp(µs) — a NAIVE timestamp, so the oracle
  // is timezone-free (to_timestamp returns TIMESTAMPTZ and its DATE cast
  // would follow the DuckDB session timezone, which the gate never pins)
  def qEvtDeadtimeSql: String =
    """WITH m AS (SELECT CAST(floor(epoch(ts) / 60) AS BIGINT) AS m FROM events),
      |b AS (SELECT min(m) AS lo, max(m) AS hi FROM m),
      |mins AS (SELECT r.i AS m FROM b, unnest(range(b.lo, b.hi + 1)) AS r(i)),
      |dead AS (SELECT m FROM mins WHERE m NOT IN (SELECT m FROM m))
      |SELECT CAST(make_timestamp(m * 60 * 1000000) AS DATE) AS day,
      |  CAST(count(*) AS BIGINT) AS n_dead_minutes
      |FROM dead GROUP BY 1""".stripMargin

  /** Dead time attributed per RUN and TRIGGER CONFIG — the shifter's actual
    * report ("which runs lost minutes, under which trigger config", cf.
    * run/run_iceberg_daq.sh run stamping + the tlu epoch scripts): the
    * q_evt_deadtime dead-minute set (zero-event minutes over the global
    * span), each minute stamped with the authoritative run containing it
    * ([start_ts, stop_ts)) and the trigger epoch containing it
    * ([valid_from, valid_until)). Minutes in inter-run gaps drop (inner
    * join — between runs the detector is EXPECTED silent; only in-run dead
    * time is a stall). Scale shape: the dead-minute set is time-bounded
    * (43 k rows / 30 days at any event volume) and both dims are KB-scale
    * broadcasts, so everything after the presence anti-join is narrow. */
  def qDeadtimeRuns(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(floor(unix_timestamp(col("ts")) / 60).as("m"))
    val bounds = ev.agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
    val minutes = bounds.select(explode(sequence(col("lo"), col("hi"))).as("m"))
    val dead = minutes.join(ev.distinct(), Seq("m"), "left_anti")
      .withColumn("mts", timestamp_seconds(col("m") * 60))
    val runsDim = Runs.authoritativeRuns(s)
    val ep = Trigger.epochs(s)
    dead
      .join(broadcast(runsDim),
        dead("mts") >= runsDim("start_ts") && dead("mts") < runsDim("stop_ts"))
      .join(broadcast(ep),
        dead("mts") >= ep("valid_from")
          && (ep("valid_until").isNull || dead("mts") < ep("valid_until")))
      .groupBy(col("run_number"), col("config_name"), col("epoch_id"),
        col("faketrig_rate_hz"))
      .agg(count(lit(1)).as("n_dead_minutes"),
        min(col("m")).as("first_dead_minute"),
        max(col("m")).as("last_dead_minute"))
  }

  def qDeadtimeRunsSql: String = {
    val rp = graft.sources.Configs.absDir(Runs.DefaultRunsPath)
    val tp = graft.sources.Configs.absDir(Trigger.DefaultPath)
    s"""WITH m AS (SELECT CAST(floor(epoch(ts) / 60) AS BIGINT) AS m FROM events),
       |b AS (SELECT min(m) AS lo, max(m) AS hi FROM m),
       |mins AS (SELECT r.i AS m FROM b, unnest(range(b.lo, b.hi + 1)) AS r(i)),
       |dead AS (SELECT m, make_timestamp(m * 60 * 1000000) AS mts
       |  FROM mins WHERE m NOT IN (SELECT m FROM m)),
       |runs AS (SELECT run_number, config_name,
       |  CAST(start_ts AS TIMESTAMP) AS start_ts,
       |  CAST(stop_ts AS TIMESTAMP) AS stop_ts FROM read_json_auto('$rp')),
       |ep0 AS (SELECT epoch_id, faketrig_rate_hz,
       |  CAST(valid_from AS TIMESTAMP) AS valid_from FROM read_json_auto('$tp')),
       |ep AS (SELECT *, lead(valid_from) OVER (ORDER BY valid_from)
       |  AS valid_until FROM ep0)
       |SELECT r.run_number, r.config_name, ep.epoch_id, ep.faketrig_rate_hz,
       |  count(*) AS n_dead_minutes,
       |  min(d.m) AS first_dead_minute, max(d.m) AS last_dead_minute
       |FROM dead d
       |JOIN runs r ON d.mts >= r.start_ts AND d.mts < r.stop_ts
       |JOIN ep ON d.mts >= ep.valid_from
       |  AND (ep.valid_until IS NULL OR d.mts < ep.valid_until)
       |GROUP BY r.run_number, r.config_name, ep.epoch_id, ep.faketrig_rate_hz""".stripMargin
  }

  /** Coincidence window in seconds (±). */
  val CoincSeconds = 60

  /** Trigger-coincidence counting — the DAQ physics primitive: for every
    * `error` event, how many events of each OTHER type fired within ±60 s
    * anywhere in the detector. Never a naive time cross-join: both sides
    * bucket to 60 s epochs and the error side explodes to its 3 adjacent
    * buckets, so the join is a shuffle EQUI-join on the bucket key with
    * the |Δt| residual applied after — a pair can only match in one
    * exploded bucket per side pair, so no distinct is needed. Output is
    * decisions-shaped: one row per (error event, other type). */
  def qEvtCoincidence(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val errs = ev.filter(col("event_type") === "error")
      .withColumn("b", floor(unix_timestamp(col("ts")) / CoincSeconds))
      .select(col("event_id").as("error_id"), col("ts").as("err_ts"),
        explode(array(col("b") - 1, col("b"), col("b") + 1)).as("bucket"))
    val others = ev.filter(col("event_type") =!= "error")
      .select(col("event_type"), col("ts").as("o_ts"),
        floor(unix_timestamp(col("ts")) / CoincSeconds).as("bucket"))
    errs.join(others, "bucket")
      .filter(abs(unix_micros(col("o_ts")) - unix_micros(col("err_ts")))
        <= CoincSeconds * 1000000L)
      .groupBy(col("error_id"), col("event_type"))
      .agg(count(lit(1)).as("n_coincident"))
  }

  def qEvtCoincidenceSql: String =
    """SELECT e.event_id AS error_id, o.event_type,
      | CAST(count(*) AS BIGINT) AS n_coincident
      |FROM events e JOIN events o
      |  ON o.event_type <> 'error'
      | AND abs(epoch_us(o.ts) - epoch_us(e.ts)) <= 60000000
      |WHERE e.event_type = 'error'
      |GROUP BY e.event_id, o.event_type""".stripMargin

  /** FANO-FACTOR / DISPERSION-INDEX audit per event type — the standard
    * Poisson-consistency check on a counting process (a steady trigger or
    * decay source gives Fano = var/mean ≈ 1 over fixed time bins; F ≫ 1
    * flags bursting/pile-up, F ≪ 1 a rate-limited or clock-driven
    * source). Counts bin per minute; EMPTY minutes inside each type's
    * [first, last] span count as zeros WITHOUT materializing them: with
    * k = span minutes, S = Σc (all events) and Σc² over occupied bins
    * only, sample variance = (k·Σc² − S²)/(k(k−1)) and
    * F = var/mean = (k·Σc² − S²)/((k−1)·S) — every term an exact
    * integer. The ratio reports as (1e6·num) DIV den in
    * DECIMAL(38,0)/HUGEINT (both engines truncate toward zero — the
    * money-path rule); the double form is a single division of exact
    * integer-valued operands. Width bound: k·Σc² ≤ k·S·max c — inside
    * 38 digits to ~1e12 events over a 30-day minute span.
    *
    * Scale shape: one map-side-combined (type, minute) count, then a
    * per-type re-aggregation of longs — two narrow shuffles, no joins,
    * no minute dimension ever generated (contrast q_evt_deadtime, which
    * needs the dead minutes themselves). */
  def qEvtFano(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"))
      .groupBy(col("event_type"), col("m"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).cast("long").as("n_events"),
        (max(col("m")) - min(col("m")) + 1).cast("long").as("k"),
        count(lit(1)).as("n_occupied"),
        sum(col("c") * col("c")).cast("long").as("sc2"))
      .filter(col("k") >= 2) // a single-minute span has no variance
      .withColumn("fano_scaled", expr(
        "CAST(CAST(1000000 AS DECIMAL(38,0))" +
          " * (CAST(k AS DECIMAL(38,0)) * sc2" +
          "    - CAST(n_events AS DECIMAL(38,0)) * n_events)" +
          " DIV (CAST(k - 1 AS DECIMAL(38,0)) * n_events) AS BIGINT)"))
      .select(col("event_type"), col("n_events"), col("k").as("n_minutes"),
        col("n_occupied"), col("fano_scaled"),
        (col("fano_scaled").cast("double") / 1000000.0).as("fano"))
  }

  def qEvtFanoSql: String =
    """WITH c AS (
      |  SELECT event_type, CAST(floor(epoch(ts) / 60) AS BIGINT) AS m,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), a AS (
      |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
      |    max(m) - min(m) + 1 AS k,
      |    CAST(count(*) AS BIGINT) AS n_occupied,
      |    CAST(sum(c * c) AS BIGINT) AS sc2
      |  FROM c GROUP BY event_type
      |)
      |SELECT event_type, n_events, k AS n_minutes, n_occupied,
      |  CAST(CAST(1000000 AS HUGEINT)
      |    * (CAST(k AS HUGEINT) * sc2 - CAST(n_events AS HUGEINT) * n_events)
      |    // (CAST(k - 1 AS HUGEINT) * n_events) AS BIGINT) AS fano_scaled,
      |  CAST(CAST(CAST(1000000 AS HUGEINT)
      |    * (CAST(k AS HUGEINT) * sc2 - CAST(n_events AS HUGEINT) * n_events)
      |    // (CAST(k - 1 AS HUGEINT) * n_events) AS BIGINT) AS DOUBLE)
      |    / CAST(1000000 AS DOUBLE) AS fano
      |FROM a WHERE k >= 2""".stripMargin

  /** INTERARRIVAL-RATE report per event type — the trigger-rate readout
    * every DAQ shift screen shows next to occupancy (the MLE of an
    * exponential arrival process is the closed form λ̂ = gaps/Σdt — no
    * fit loop), plus the extreme gaps (max gap = the worst stall, the
    * quantity the dead-time alarm keys on). All exact integers:
    * interarrival gaps in microseconds off ONE type-partitioned window
    * pass, λ reported as (10¹²·n_gaps) DIV Σdt_µs — events/sec scaled
    * 1e6, the money-path DIV on both engines; the double form is a
    * single exact-integer division. Single-event types (no gap) drop.
    *
    * Scale shape: one event_type exchange for the lag, map-side-combined
    * re-agg to #types rows. */
  def qEvtRate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("dt", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("dt")).as("n_gaps"),
        sum(col("dt")).cast("long").as("sum_dt_us"),
        max(col("dt")).as("max_gap_us"),
        min(col("dt")).as("min_gap_us"))
      .filter(col("n_gaps") > 0 && col("sum_dt_us") > 0)
      .withColumn("rate_scaled", expr(
        "CAST(CAST(1000000000000 AS DECIMAL(38,0)) * n_gaps" +
          " DIV sum_dt_us AS BIGINT)"))
      .select(col("event_type"), col("n_events"), col("sum_dt_us"),
        col("max_gap_us"), col("min_gap_us"), col("rate_scaled"),
        (col("rate_scaled").cast("double") / 1000000.0)
          .as("rate_per_sec"))
  }

  def qEvtRateSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY event_type ORDER BY ts, event_id) AS dt
      |  FROM events
      |), a AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(count(dt) AS BIGINT) AS n_gaps,
      |    CAST(sum(dt) AS BIGINT) AS sum_dt_us,
      |    CAST(max(dt) AS BIGINT) AS max_gap_us,
      |    CAST(min(dt) AS BIGINT) AS min_gap_us
      |  FROM g GROUP BY event_type
      |)
      |SELECT event_type, n_events, sum_dt_us, max_gap_us, min_gap_us,
      |  CAST(CAST(1000000000000 AS HUGEINT) * n_gaps // sum_dt_us
      |    AS BIGINT) AS rate_scaled,
      |  CAST(CAST(CAST(1000000000000 AS HUGEINT) * n_gaps // sum_dt_us
      |    AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS rate_per_sec
      |FROM a WHERE n_gaps > 0 AND sum_dt_us > 0""".stripMargin

  /** Sliding-window width (minutes) for [[qEvtBurst]]. */
  val BurstWindowMin = 5

  /** PEAK-RATE / BURST detection per event type — the "worst 5 minutes"
    * readout a DAQ rate monitor alarms on (pile-up, beam spills, retry
    * storms): the maximum event count in ANY sliding 5-minute window,
    * and the earliest minute where that peak occurs. Exact integers end
    * to end: counts bin per minute (span-bounded relation), the sliding
    * sum is a RANGE window over the minute VALUE ([m−4, m] — gap-proof:
    * missing minutes contribute nothing, and a rows-frame would silently
    * skip them), the peak is a plain max, and the earliest peaking
    * minute comes from an equality join back on the bounded frame —
    * both engines replay identically, no packing tricks needed.
    *
    * Scale shape: one map-side-combined (type, minute) count, window +
    * max + the argmin join all on the span-bounded relation. */
  def qEvtBurst(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"))
      .groupBy(col("event_type"), col("m"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("m"))
      .rangeBetween(-(BurstWindowMin - 1), 0)
    val sums = counts
      .withColumn("wsum", sum(col("c")).over(w).cast("long"))
      .localCheckpoint() // span-bounded; feeds the max + the argmin join
    val peak = sums.groupBy(col("event_type"))
      .agg(max(col("wsum")).as("peak_count"),
        sum(col("c")).cast("long").as("n_events"))
    peak.join(sums.select(col("event_type"), col("m"), col("wsum")),
        Seq("event_type"))
      .filter(col("wsum") === col("peak_count"))
      .groupBy(col("event_type"))
      .agg(max(col("peak_count")).as("peak_count"),
        max(col("n_events")).as("n_events"),
        min(col("m")).as("peak_minute"))
      .select(col("event_type"), col("n_events"), col("peak_count"),
        col("peak_minute"))
  }

  def qEvtBurstSql: String =
    s"""WITH c AS (
       |  SELECT event_type, CAST(floor(epoch(ts) / 60) AS BIGINT) AS m,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2
       |), s AS (
       |  SELECT event_type, m, c,
       |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY m
       |      RANGE BETWEEN ${BurstWindowMin - 1} PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS wsum
       |  FROM c
       |), p AS (
       |  SELECT event_type, max(wsum) AS peak_count,
       |    CAST(sum(c) AS BIGINT) AS n_events
       |  FROM s GROUP BY event_type
       |)
       |SELECT p.event_type, p.n_events, p.peak_count,
       |  min(s.m) AS peak_minute
       |FROM p JOIN s ON s.event_type = p.event_type
       |  AND s.wsum = p.peak_count
       |GROUP BY p.event_type, p.n_events, p.peak_count""".stripMargin

  /** CHANGEPOINT LOCALIZATION per event type — the single-split
    * Poisson-rate MLE over minute bins (binary-segmentation's first
    * step; the "WHEN did the rate shift" question CUSUM's "did it
    * drift" answer leaves open — the rate-step localization every ops/
    * DAQ shift log wants): over span minutes w with total N, a boundary
    * after the t-th minute scores the two-segment log-likelihood
    * n1·ln(n1/t) + n2·ln(n2/(w−t)); the reported split maximizes it and
    * `llr_scaled` is the gain over the no-split model N·ln(N/w).
    *
    * Exactness discipline: every logarithm lands on the 1e6-quantized
    * grid L(x) = floor(1e6·ln x) evaluated on INTEGERS only (counts and
    * minute widths — the q_doc_entropy recipe; NEVER a composed ln of a
    * ratio, the Benford caveat), so the objective is a plain BIGINT sum
    * of integer products both engines replay bit-for-bit; n2 = 0 takes
    * the 0·ln 0 = 0 limit. Candidates are the OBSERVED minute
    * boundaries below the last minute (the data points — part of the
    * operator's definition, replayed by the oracle); ties take the
    * EARLIEST boundary. Single-minute spans have no candidate and drop.
    *
    * Scale shape: one (type, minute) count exchange, a per-type window
    * prefix sum over the span-bounded minute relation, and two passes
    * over that KB-scale candidate frame (argmax + row recovery — the
    * frame localCheckpoints once; the struct-valued min_by runs on the
    * type-bounded fold, the documented KB-frame SortAggregate
    * exception). */
  def qEvtChangepoint(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def L(c: org.apache.spark.sql.Column) =
      floor(lit(1000000.0) * log(c.cast("double"))).cast("long")
    val mc = events(s, d)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"))
      .groupBy(col("event_type"), col("m"))
      .agg(count(lit(1)).as("c"))
    val tot = mc.groupBy(col("event_type"))
      .agg(min(col("m")).as("m0"), max(col("m")).as("mT"),
        sum(col("c")).cast("long").as("n"))
    val cand = mc
      .withColumn("cum", sum(col("c")).over(Window
        .partitionBy(col("event_type")).orderBy(col("m"))).cast("long"))
      .join(broadcast(tot), "event_type")
      .filter(col("m") < col("mT"))
      .withColumn("t", col("m") - col("m0") + 1)
      .withColumn("w", col("mT") - col("m0") + 1)
      .withColumn("n1", col("cum"))
      .withColumn("n2", col("n") - col("cum"))
      .withColumn("score",
        col("n1") * L(col("n1")) - col("n1") * L(col("t"))
          + when(col("n2") > 0,
              col("n2") * L(col("n2"))
                - col("n2") * L(col("w") - col("t")))
            .otherwise(lit(0L)))
      .localCheckpoint() // span-bounded KB frame, consumed twice below
    val best = cand.groupBy(col("event_type"))
      .agg(max(col("score")).as("best"))
    cand.join(broadcast(best), "event_type")
      .filter(col("score") === col("best"))
      .groupBy(col("event_type"))
      .agg(min(col("t")).as("t_star"), max(col("best")).as("score_best"),
        min_by(struct(col("n1"), col("n2"), col("n"), col("w"),
          col("m0")), col("t")).as("r"))
      .select(col("event_type"), col("r.n").as("n_events"),
        col("r.w").as("n_minutes"),
        (col("r.m0") + col("t_star") - 1).as("split_minute"),
        col("r.n1").as("n_left"), col("r.n2").as("n_right"),
        (col("score_best")
          - (col("r.n") * L(col("r.n")) - col("r.n") * L(col("r.w"))))
          .as("llr_scaled"))
      .withColumn("llr", col("llr_scaled").cast("double") / 1000000.0)
      .orderBy(col("event_type"))
  }

  def qEvtChangepointSql: String =
    """WITH mc AS MATERIALIZED (
      |  SELECT event_type, CAST(floor(epoch(ts) / 60) AS BIGINT) AS m,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |tot AS MATERIALIZED (
      |  SELECT event_type, min(m) AS m0, max(m) AS mT,
      |    CAST(sum(c) AS BIGINT) AS n FROM mc GROUP BY 1),
      |cand AS MATERIALIZED (
      |  SELECT mc.event_type,
      |    CAST(sum(c) OVER (PARTITION BY mc.event_type ORDER BY mc.m)
      |      AS BIGINT) AS n1,
      |    mc.m - t.m0 + 1 AS t, t.mT - t.m0 + 1 AS w, t.n, t.m0
      |  FROM mc JOIN tot t USING (event_type)
      |  WHERE mc.m < t.mT),
      |sc AS MATERIALIZED (
      |  SELECT event_type, t, n1, n - n1 AS n2, w, n, m0,
      |    n1 * CAST(floor(1e6 * ln(CAST(n1 AS DOUBLE))) AS BIGINT)
      |      - n1 * CAST(floor(1e6 * ln(CAST(t AS DOUBLE))) AS BIGINT)
      |      + CASE WHEN n - n1 > 0 THEN
      |          (n - n1) * CAST(floor(1e6 * ln(CAST(n - n1 AS DOUBLE)))
      |            AS BIGINT)
      |          - (n - n1) * CAST(floor(1e6 * ln(CAST(w - t AS DOUBLE)))
      |            AS BIGINT)
      |        ELSE 0 END AS score
      |  FROM cand),
      |best AS MATERIALIZED (
      |  SELECT event_type, max(score) AS best FROM sc GROUP BY 1),
      |pick AS MATERIALIZED (
      |  SELECT sc.event_type, min(sc.t) AS t_star, max(b.best) AS best
      |  FROM sc JOIN best b ON sc.event_type = b.event_type
      |    AND sc.score = b.best
      |  GROUP BY 1)
      |SELECT p.event_type, s.n AS n_events, s.w AS n_minutes,
      |  s.m0 + p.t_star - 1 AS split_minute,
      |  s.n1 AS n_left, s.n2 AS n_right,
      |  p.best - (s.n * CAST(floor(1e6 * ln(CAST(s.n AS DOUBLE)))
      |      AS BIGINT)
      |    - s.n * CAST(floor(1e6 * ln(CAST(s.w AS DOUBLE))) AS BIGINT))
      |    AS llr_scaled,
      |  CAST(p.best - (s.n * CAST(floor(1e6 * ln(CAST(s.n AS DOUBLE)))
      |      AS BIGINT)
      |    - s.n * CAST(floor(1e6 * ln(CAST(s.w AS DOUBLE))) AS BIGINT))
      |    AS DOUBLE) / CAST(1000000 AS DOUBLE) AS llr
      |FROM pick p JOIN sc s ON s.event_type = p.event_type
      |  AND s.t = p.t_star
      |ORDER BY p.event_type""".stripMargin

  /** Autocorrelation lags scanned by [[qEvtPeriodicity]] (bounded fan of
    * lead columns — model-size, not data-size). */
  val AcfLagMax = 8

  /** DOMINANT-PERIODICITY detection per user series — the multi-lag
    * extension of q_evt_autocorr (Box–Jenkins ACF scan: a series with
    * period p shows its ACF maximum at lag p; the periodic-noise /
    * clock-pickup QA signal): r_k = Σ c_t·c_{t+k} / Σ c_t² for
    * k = 1..[[AcfLagMax]] with c_t = n·v_t − S the exact n-multiplied
    * centered integers (the CUSUM rule), all numerators exact
    * DECIMAL(38,0)/HUGEINT sums over ONE shared denominator. Because the
    * denominator is shared and positive, the best lag is the argmax of
    * the NUMERATORS — no division decides anything; ties take the
    * SMALLEST lag via the earliest-index CASE chain (the kmeans/langid
    * argmax rule: lag k wins iff it strictly beats every earlier and
    * ties-or-beats every later numerator). Only the winning ratio is
    * reported, as (1e6·num) DIV den (exact, money-path truncation).
    *
    * Scale shape: ONE user_id exchange shared by the stats window and
    * all [[AcfLagMax]] lead passes (one window sort serves every lead),
    * then a per-user aggregate of decimal partial sums. Requires
    * n > AcfLagMax (shorter series have no lag-8 pair and the scan
    * degenerates); constant series (den = 0) drop. */
  def qEvtPeriodicity(s: SparkSession, d: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val lags = 1 to AcfLagMax
    val base = events(s, d)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        (dec(col("value")) * 10000).cast("long").as("v"))
      .withColumn("n", count(lit(1)).over(wu))
      .withColumn("sv", sum(col("v")).over(wu))
      .withColumn("c", d38(col("n") * col("v") - col("sv")))
    val withLeads = lags.foldLeft(base) { (df, k) =>
      df.withColumn(s"c$k", lead(col("c"), k).over(wo))
    }
    val agg = withLeads.groupBy(col("user_id"))
      .agg(max(col("n")).cast("long").as("n_events"),
        sum(col("c") * col("c")).as("den") +:
          lags.map(k => sum(when(col(s"c$k").isNotNull, col("c") * col(s"c$k"))
            .otherwise(d38(lit(0)))).as(s"num$k")): _*)
      .filter(col("n_events") > AcfLagMax && col("den") =!= 0)
    // earliest-lag argmax over the shared-denominator numerators
    val bestLag = lags.dropRight(1).foldRight(lit(AcfLagMax): Column) {
      case (k, els) =>
        val wins = (lags.filter(_ < k).map(i => col(s"num$k") > col(s"num$i"))
          ++ lags.filter(_ > k).map(i => col(s"num$k") >= col(s"num$i")))
          .reduce(_ && _)
        when(wins, k).otherwise(els)
    }
    val bestNum = lags.dropRight(1).foldRight(col(s"num$AcfLagMax")) {
      case (k, els) => when(col("best_lag") === k, col(s"num$k")).otherwise(els)
    }
    agg.withColumn("best_lag", bestLag.cast("int"))
      .withColumn("bn", bestNum)
      .withColumn("r_scaled", expr(
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * bn DIV den AS BIGINT)"))
      .select(col("user_id"), col("n_events"), col("best_lag"),
        col("r_scaled"),
        (col("r_scaled").cast("double") / 1000000.0).as("r_best"))
  }

  def qEvtPeriodicitySql: String = {
    val lags = 1 to AcfLagMax
    val leadCols = lags.map(k =>
      s"lead(c, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c$k")
      .mkString(",\n      |    ")
    val numCols = lags.map(k =>
      s"sum(CASE WHEN c$k IS NOT NULL THEN c * c$k ELSE 0::HUGEINT END) AS num$k")
      .mkString(",\n      |    ")
    val caseChain = lags.dropRight(1).reverse.foldLeft(s"$AcfLagMax") {
      case (els, k) =>
        val wins = (lags.filter(_ < k).map(i => s"num$k > num$i")
          ++ lags.filter(_ > k).map(i => s"num$k >= num$i")).mkString(" AND ")
        s"CASE WHEN $wins THEN $k ELSE $els END"
    }
    val numChain = lags.dropRight(1).reverse.foldLeft(s"num$AcfLagMax") {
      case (els, k) => s"CASE WHEN best_lag = $k THEN num$k ELSE $els END"
    }
    s"""WITH v AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL
      |), c0 AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
      |    CAST(CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) * v
      |      - CAST(sum(v) OVER (PARTITION BY user_id) AS BIGINT)
      |      AS HUGEINT) AS c
      |  FROM v
      |), c AS (
      |  SELECT user_id, n, c,
      |    $leadCols
      |  FROM c0
      |), a AS (
      |  SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
      |    sum(c * c) AS den,
      |    $numCols
      |  FROM c GROUP BY user_id
      |), b AS (
      |  SELECT *, $caseChain AS best_lag
      |  FROM a WHERE n_events > $AcfLagMax AND den <> 0
      |)
      |SELECT user_id, n_events, CAST(best_lag AS INT) AS best_lag,
      |  CAST(CAST(1000000 AS HUGEINT) * ($numChain) // den AS BIGINT)
      |    AS r_scaled,
      |  CAST(CAST(CAST(1000000 AS HUGEINT) * ($numChain) // den AS BIGINT)
      |    AS DOUBLE) / CAST(1000000 AS DOUBLE) AS r_best
      |FROM b""".stripMargin
  }

  /** Fixed (day-of-week × hour-of-day) bucket count — the classic
    * operational seasonality profile grid. */
  val SeasonalityK = 7 * 24

  /** SEASONALITY PROFILE + uniformity χ² [oracle] — the
    * (day-of-week × hour-of-day) load grid every ops dashboard draws,
    * plus Pearson's χ² against the uniform profile (the detector-uptime
    * "is arrival rate flat?" check; the q_evt_fano dispersion family).
    * Exactness (the Fano/variance class): with k = 168 fixed buckets
    * and N total events, χ² = Σ_b (k·o_b − N)² / (k·N) — empty buckets
    * contribute (k·0 − N)² = N² IMPLICITLY via (k − B_obs)·N², never a
    * materialized bin dimension; every per-bucket quantity is a
    * nonnegative integer ratio (⌊10⁶·x⌋ DIV y), so no negative-division
    * or libm divergence anywhere. DuckDB's dayofweek is 0=Sunday where
    * Spark's is 1=Sunday — the oracle text adds 1.
    *
    * Scale shape: one groupBy onto ≤ 168 buckets (map-side partials
    * collapse the corpus before the exchange), a 1-row cross join, and
    * a bounded 168-row window for the profile-wide χ². */
  def qEvtSeasonality(s: SparkSession, d: String): DataFrame = {
    val k = SeasonalityK
    val b = events(s, d)
      .select(dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"))
    val tot = b.agg(sum(col("n_events")).cast("long").as("n"),
      count(lit(1)).as("bobs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    b.crossJoin(tot)
      .withColumn("dev2",
        (lit(k) * col("n_events") - col("n")).cast("decimal(38,0)")
          * (lit(k) * col("n_events") - col("n")))
      .withColumn("chi2num",
        sum(col("dev2")).over(w)
          + (lit(k) - col("bobs")).cast("decimal(38,0)")
          * col("n").cast("decimal(38,0)") * col("n"))
      .select(col("dow"), col("hod"), col("n_events"),
        expr(s"CAST(CAST(1000000 AS DECIMAL(38,0)) * $k * n_events " +
          "DIV n AS BIGINT)").as("load_scaled"),
        expr(s"CAST(CAST(1000000 AS DECIMAL(38,0)) * chi2num DIV " +
          s"(CAST($k AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("chi2_scaled"))
      .withColumn("chi2",
        col("chi2_scaled").cast("double") / lit(1000000.0))
      .orderBy(col("dow"), col("hod"))
  }

  def qEvtSeasonalitySql: String = {
    val k = SeasonalityK
    s"""WITH b AS MATERIALIZED (
       |  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       |    CAST(hour(ts) AS BIGINT) AS hod,
       |    CAST(count(*) AS BIGINT) AS n_events
       |  FROM events GROUP BY 1, 2
       |), tot AS (
       |  SELECT CAST(sum(n_events) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS bobs FROM b
       |), g AS (
       |  SELECT dow, hod, n_events, n, bobs,
       |    sum(CAST($k * n_events - n AS HUGEINT)
       |      * CAST($k * n_events - n AS HUGEINT)) OVER ()
       |      + CAST($k - bobs AS HUGEINT) * n * n AS chi2num
       |  FROM b CROSS JOIN tot
       |)
       |SELECT dow, hod, n_events,
       |  CAST(CAST(1000000 AS HUGEINT) * $k * n_events // n AS BIGINT)
       |    AS load_scaled,
       |  CAST(CAST(1000000 AS HUGEINT) * chi2num
       |    // (CAST($k AS HUGEINT) * n) AS BIGINT) AS chi2_scaled,
       |  CAST(CAST(CAST(1000000 AS HUGEINT) * chi2num
       |    // (CAST($k AS HUGEINT) * n) AS BIGINT) AS DOUBLE)
       |    / CAST(1000000 AS DOUBLE) AS chi2
       |FROM g
       |ORDER BY dow, hod""".stripMargin
  }
}
