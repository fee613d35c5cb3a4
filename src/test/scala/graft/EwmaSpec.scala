package graft

import graft.operators.Events
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming EWMA anomaly monitor (Streams.ewmaAnomalies): alarms equal
  * the driver-computed recurrence exactly, across micro-batch splits. */
/** Top-level (not spec-inner): product encoders for parquet round-trips
  * need a class without an outer scope. */
case class FanoEvt(event_id: Long, ts: Timestamp, user_id: Long,
  event_type: String, value: Double)

class EwmaSpec extends GraftSpec {

  case class RawEvt(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  private val (alpha, k, warmup) = (0.1, 4.0, 20L)

  /** The same recurrence, straight-line. */
  private def refAlarms(evts: Seq[RawEvt]): Set[Long] = {
    val out = Set.newBuilder[Long]
    evts.groupBy(_.event_type).foreach { case (_, es) =>
      var (mean, varr, n) = (0.0, 0.0, 0L)
      es.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        if (n >= warmup && math.abs(e.value - mean) > k * math.sqrt(varr))
          out += e.event_id
        if (n == 0L) { mean = e.value; n = 1 }
        else {
          val d = e.value - mean
          mean += alpha * d; varr = (1 - alpha) * (varr + alpha * d * d)
          n += 1
        }
      }
    }
    out.result()
  }

  test("alarms equal the batch recurrence, in one batch and across a " +
      "time-ordered split") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val base = Events.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => RawEvt(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    // guarantee at least one alarm: a spike far outside any band,
    // landing after the warmup region of its type
    val spikeTs = new Timestamp(base.last.ts.getTime + 1000)
    val all = base :+ RawEvt(990001L, spikeTs, 1L, base.head.event_type, 1e9)
    val want = refAlarms(all)
    assert(want.contains(990001L), "spike must alarm")

    def run(batches: Seq[Seq[RawEvt]], name: String): Set[Long] = {
      val mem = MemoryStream[RawEvt]
      val q = Streams.ewmaAnomalies(spark, mem.toDF(), alpha, k, warmup)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        spark.table(name).select("event_id").collect()
          .map(_.getLong(0)).toSet
      } finally q.stop()
    }
    val oneShot = run(Seq(all), "ewma_one")
    assert(oneShot == want, s"one-batch: ${oneShot.size} vs ${want.size}")
    val mid = all.length / 2
    val split = run(Seq(all.take(mid), all.drop(mid)), "ewma_split")
    assert(split == want, s"split run diverged: ${split.size} vs ${want.size}")
  }

  test("streaming CUSUM: a planted level shift alarms only after drifting " +
      "past the threshold; state is exact across a batch split; flat " +
      "series never alarms") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val (refS, allowS, threshS) = (500000L, 250000L, 2000000L) // 50/25/200
    def evt(uid: Long, i: Int, v: Double) =
      RawEvt(uid * 1000 + i, new Timestamp(1700000000000L + i * 1000L),
        uid, "m", v)
    // user 1: on-baseline 50.0 then a shift to 125.0 (+50 over ref+allow
    // per event → S crosses 200.0 after 4 shifted points); user 2 flat
    val all = (0 until 30).map(i => evt(1, i, 50.0)) ++
      (30 until 40).map(i => evt(1, i, 125.0)) ++
      (0 until 40).map(i => evt(2, i, 50.0))
    def run(batches: Seq[Seq[RawEvt]], name: String): Seq[(Long, Long)] = {
      val mem = MemoryStream[RawEvt]
      val q = graft.streaming.Streams
        .cusumAlarms(spark, mem.toDF(), refS, allowS, threshS)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        spark.table(name).select("user_id", "event_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      } finally q.stop()
    }
    val oneShot = run(Seq(all), "cusum_one")
    // +50.0 excess per shifted event: S = 50,100,150,200,250,… — strict
    // `>` crosses at the 5th shifted point (index 34) and stays up
    assert(oneShot == (34 until 40).map(i => (1L, 1000L + i)),
      s"got $oneShot")
    // exact integer state ⇒ a mid-shift batch split changes nothing
    val split = run(Seq(all.take(33), all.drop(33)), "cusum_split")
    assert(split == oneShot, s"split diverged: $split")
  }

  case class NullableEvt(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Option[Double])

  test("streaming CUSUM: null values are dropped, not fatal — alarms " +
      "match the null-free feed (the batch twin's filter)") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val (refS, allowS, threshS) = (500000L, 250000L, 2000000L)
    def evt(i: Int, v: Option[Double]) =
      NullableEvt(1000L + i, new Timestamp(1700000000000L + i * 1000L),
        1L, "m", v)
    // nulls interleaved through the shift — a null used to kill the
    // query at the non-nullable encoder before any alarm surfaced
    val all = (0 until 30).map(i => evt(i, Some(50.0))) ++
      Seq(evt(100, None)) ++
      (30 until 40).map(i => evt(i, Some(125.0))) ++
      Seq(evt(101, None))
    val mem = MemoryStream[NullableEvt]
    val q = graft.streaming.Streams
      .cusumAlarms(spark, mem.toDF(), refS, allowS, threshS)
      .writeStream.format("memory").queryName("cusum_null")
      .outputMode("append").start()
    val got = try {
      mem.addData(all); q.processAllAvailable()
      spark.table("cusum_null").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
    } finally q.stop()
    assert(got == (1034L to 1039L), s"got $got")
  }

  test("streaming rate monitor: the final per-type report equals the " +
      "batch q_evt_rate over the same events, one-shot and split") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val base = 1700000000000L
    def evt(id: Long, tpe: String, offsetMs: Long) =
      FanoEvt(id, new Timestamp(base + offsetMs), 1L, tpe, 1.0)
    // irregular arrivals for "a" (gaps 1s, 5s, 2s); a single-event type
    // "solo" must emit nothing (no gap to estimate from)
    val all = Seq(evt(1, "a", 0), evt(2, "a", 1000), evt(3, "a", 6000),
      evt(4, "a", 8000), evt(10, "solo", 500))
    val tmp = java.nio.file.Files.createTempDirectory("graft_rate").toString
    all.toDF().withColumn("props", lit("{}"))
      .write.parquet(s"$tmp/events.parquet")
    val want = graft.operators.Events.qEvtRate(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("sum_dt_us"),
          r.getAs[Long]("max_gap_us"), r.getAs[Long]("min_gap_us"),
          r.getAs[Long]("rate_scaled")))).toMap
    def run(batches: Seq[Seq[FanoEvt]], name: String)
        : Map[String, (Long, Long, Long, Long, Long)] = {
      val mem = MemoryStream[FanoEvt]
      val q = graft.streaming.Streams.rateMonitor(spark, mem.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
            r.getAs[Long]("sum_dt_us"), r.getAs[Long]("max_gap_us"),
            r.getAs[Long]("min_gap_us"), r.getAs[Long]("rate_scaled")))
          .groupBy(_._1).view
          .mapValues(rows => {
            val last = rows.maxBy(_._2)
            (last._2, last._3, last._4, last._5, last._6)
          }).toMap
      } finally q.stop()
    }
    val oneShot = run(Seq(all), "rate_one")
    assert(oneShot == want, s"one-shot: $oneShot vs $want")
    assert(!oneShot.contains("solo"), "single-event type must not report")
    val split = run(Seq(all.take(2), all.slice(2, 4), all.drop(4)),
      "rate_split")
    assert(split == want, s"split diverged: $split vs $want")
    // hand check: 3 gaps over 8 s → rate = 0.375/s
    assert(oneShot("a")._5 == 375000L)
  }

  test("streaming Fano monitor: the final per-type report equals the " +
      "batch q_evt_fano over the same events, one-shot and split") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val base = 1700000000000L
    def evt(id: Long, tpe: String, minute: Long, sub: Int) =
      FanoEvt(id, new Timestamp(base + minute * 60000L + sub * 1000L),
        1L, tpe, 1.0)
    // type "bursty": 5+3 events in two minutes of a 10-minute span;
    // type "steady": one event per minute for 8 minutes
    val all =
      (0 until 5).map(i => evt(100 + i, "bursty", 0, i)) ++
        (0 until 3).map(i => evt(200 + i, "bursty", 9, i)) ++
        (0 until 8).map(i => evt(300 + i, "steady", i, 0))
    // batch reference: the gate operator over the same rows on disk
    val tmp = java.nio.file.Files.createTempDirectory("graft_fano").toString
    all.toDF().withColumn("props", lit("{}"))
      .write.parquet(s"$tmp/events.parquet")
    val want = graft.operators.Events.qEvtFano(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_minutes"),
          r.getAs[Long]("n_occupied"), r.getAs[Long]("fano_scaled"))))
      .toMap
    def run(batches: Seq[Seq[FanoEvt]], name: String)
        : Map[String, (Long, Long, Long, Long)] = {
      val mem = MemoryStream[FanoEvt]
      val q = graft.streaming.Streams.fanoMonitor(spark, mem.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        // last emitted row per type = the final report
        spark.table(name).collect()
          .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
            r.getAs[Long]("n_minutes"), r.getAs[Long]("n_occupied"),
            r.getAs[Long]("fano_scaled")))
          .groupBy(_._1).view
          .mapValues(rows => {
            val last = rows.maxBy(_._2) // n_events grows monotonically
            (last._2, last._3, last._4, last._5)
          }).toMap
      } finally q.stop()
    }
    val oneShot = run(Seq(all), "fano_one")
    assert(oneShot == want, s"one-shot: $oneShot vs $want")
    val split = run(Seq(all.take(7), all.slice(7, 12), all.drop(12)),
      "fano_split")
    assert(split == want, s"split diverged: $split vs $want")
    // hand check: bursty = k 10, S 8, sum c^2 34 →
    // 1e6*(340-64)/(9*8) = 3833333; steady is exactly Poisson-flat? no:
    // one per minute every minute has ZERO variance → fano 0... var =
    // (8*8 - 64)/... = 0 → dispersion 0 (clock-driven source, F << 1)
    assert(oneShot("bursty")._4 == 3833333L)
    assert(oneShot("steady")._4 == 0L)
  }

  test("streaming burst monitor: the final per-type report equals the " +
      "batch q_evt_burst over the same events, one-shot and split") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val base = 1700000000000L
    def evt(id: Long, tpe: String, minute: Long, sub: Int) =
      FanoEvt(id, new Timestamp(base + minute * 60000L + sub * 1000L),
        1L, tpe, 1.0)
    // "spiky": a 3-event burst at minutes 6-8 inside a 20-minute span
    // (peak window [4,8] = [5,9]? no — earliest 5-min window holding all
    // three plus neighbors decides; the batch operator is the referee);
    // "flat": one event per minute — every full window ties at 5, the
    // EARLIEST peaking minute must win; "gappy": counts astride a hole.
    val all =
      (Seq((0L, 1), (6L, 3), (7L, 4), (8L, 3), (19L, 1))
        .flatMap { case (m, k) => (0 until k).map(i =>
          evt(100 + m * 10 + i, "spiky", m, i)) }) ++
        (0 until 12).map(i => evt(300 + i, "flat", i, 0)) ++
        Seq(0, 1, 9, 10, 11).zipWithIndex.map { case (m, i) =>
          evt(400 + i, "gappy", m.toLong, 0) }
    val tmp = java.nio.file.Files.createTempDirectory("graft_burst").toString
    all.toDF().withColumn("props", lit("{}"))
      .write.parquet(s"$tmp/events.parquet")
    val want = graft.operators.Events.qEvtBurst(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("peak_count"),
          r.getAs[Long]("peak_minute"))))
      .toMap
    def run(batches: Seq[Seq[FanoEvt]], name: String)
        : Map[String, (Long, Long, Long)] = {
      val mem = MemoryStream[FanoEvt]
      val q = graft.streaming.Streams.burstMonitor(spark, mem.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getAs[String]("event_type"),
            r.getAs[Long]("n_events"), r.getAs[Long]("peak_count"),
            r.getAs[Long]("peak_minute")))
          .groupBy(_._1).view
          .mapValues(rows => {
            val last = rows.maxBy(_._2) // n_events grows monotonically
            (last._2, last._3, last._4)
          }).toMap
      } finally q.stop()
    }
    val oneShot = run(Seq(all), "burst_one")
    // both sides bin on ABSOLUTE epoch minutes — apples to apples
    assert(oneShot.keySet == want.keySet)
    oneShot.foreach { case (k, (n, pc, pm)) =>
      val (wn, wpc, wpm) = want(k)
      assert(n == wn && pc == wpc && pm == wpm,
        s"$k: stream ($n,$pc,$pm) vs batch ($wn,$wpc,$wpm)")
    }
    val split = run(Seq(all.take(5), all.slice(5, 17), all.drop(17)),
      "burst_split")
    assert(split == oneShot, s"split diverged: $split vs $oneShot")
    // hand checks (relative to the base epoch minute): flat ties at 5 →
    // the EARLIEST full window (relative minute 4) wins; spiky peaks at
    // 10 = bins 6,7,8 inside the window ending at relative minute 8
    val m0 = 1700000000L / 60
    assert(oneShot("flat")._2 == 5L && oneShot("flat")._3 == m0 + 4, oneShot)
    assert(oneShot("spiky")._2 == 10L
      && oneShot("spiky")._3 == m0 + 8, oneShot)
  }

  test("streaming MAD monitor: the final per-type report equals the " +
      "batch q_evt_mad over the same events, one-shot and split " +
      "(exact count-map state — no horizon, no caveats)") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val base = 1700000000000L
    def evt(id: Long, tpe: String, v: Double) =
      FanoEvt(id, new Timestamp(base + id * 1000L), 1L, tpe, v)
    // "spread": median 50 with two gross outliers; "tight": all equal
    // (MAD 0 → every deviation > 0 is an outlier under 2d > 3·0)
    val all =
      Seq(48.5, 49.0, 50.0, 50.0, 51.25, 52.0, 500.0, -400.0)
        .zipWithIndex.map { case (v, i) => evt(100 + i, "spread", v) } ++
        (0 until 5).map(i => evt(200 + i, "tight", 7.75)) :+
        evt(205, "tight", 7.7501)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mad").toString
    all.toDF().withColumn("props", lit("{}"))
      .write.parquet(s"$tmp/events.parquet")
    val want = graft.operators.Events.qEvtMad(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("med2"),
          r.getAs[Long]("mad2"), r.getAs[Long]("n_outliers"))))
      .toMap
    def run(batches: Seq[Seq[FanoEvt]], name: String)
        : Map[String, (Long, Long, Long, Long)] = {
      val mem = MemoryStream[FanoEvt]
      val q = graft.streaming.Streams.madMonitor(spark, mem.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getAs[String]("event_type"),
            r.getAs[Long]("n_events"), r.getAs[Long]("med2"),
            r.getAs[Long]("mad2"), r.getAs[Long]("n_outliers")))
          .groupBy(_._1).view
          .mapValues(rows => {
            val last = rows.maxBy(_._2)
            (last._2, last._3, last._4, last._5)
          }).toMap
      } finally q.stop()
    }
    val oneShot = run(Seq(all), "mad_one")
    assert(oneShot == want, s"one-shot: $oneShot vs $want")
    val split = run(Seq(all.take(3), all.slice(3, 10), all.drop(10)),
      "mad_split")
    assert(split == want, s"split diverged: $split vs $want")
    // hand check: spread median = (50+50)/2 → med2 = 1000000; the two
    // gross points must be outliers
    assert(oneShot("spread")._2 == 1000000L, oneShot)
    assert(oneShot("spread")._4 >= 2L, oneShot)
    // tight: MAD 0 → the one off-by-0.0001 reading flags
    assert(oneShot("tight")._3 == 0L && oneShot("tight")._4 == 1L, oneShot)
  }

  test("streaming burst monitor: eviction freezes finalized windows " +
      "before their bins evict (span wider than the horizon)") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val base = 1700000000000L
    def evt(id: Long, minute: Long) =
      FanoEvt(id, new Timestamp(base + minute * 60000L), 1L, "t", 1.0)
    val horizon = graft.streaming.Streams.FanoHorizonMinutes
    // a 4-event burst at minutes 2-3, then a far-future tail that evicts
    // those bins: the frozen peak must survive eviction
    val burst = Seq(evt(1, 2), evt(2, 2), evt(3, 3), evt(4, 3))
    val tail = Seq(evt(5, horizon + 20), evt(6, horizon + 21))
    val mem = MemoryStream[FanoEvt]
    val q = graft.streaming.Streams.burstMonitor(spark, mem.toDF())
      .writeStream.format("memory").queryName("burst_evict")
      .outputMode("append").start()
    try {
      mem.addData(burst); q.processAllAvailable()
      mem.addData(tail); q.processAllAvailable()
      val last = spark.table("burst_evict").collect()
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("peak_count"),
          r.getAs[Long]("peak_minute")))
        .maxBy(_._1)
      assert(last == ((6L, 4L, 1700000000L / 60 + 3)),
        s"frozen peak lost across eviction: $last")
    } finally q.stop()
  }

  test("streaming Fano monitor: a late event for an EVICTED minute does " +
      "not double-count n_occupied (advisor r14 fix)") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val base = 1700000000000L
    def evt(id: Long, minute: Long) =
      FanoEvt(id, new Timestamp(base + minute * 60000L), 1L, "t", 1.0)
    val horizon = graft.streaming.Streams.FanoHorizonMinutes
    val mem = MemoryStream[FanoEvt]
    val q = graft.streaming.Streams.fanoMonitor(spark, mem.toDF())
      .writeStream.format("memory").queryName("fano_late")
      .outputMode("append").start()
    try {
      // minute 0 opens (occ 1), far-future minute evicts it, then the
      // SAME minute 0 arrives late: occ must stay 2, not reach 3.
      mem.addData(Seq(evt(1, 0))); q.processAllAvailable()
      mem.addData(Seq(evt(2, horizon + 10))); q.processAllAvailable()
      mem.addData(Seq(evt(3, 0))); q.processAllAvailable()
      val last = spark.table("fano_late").collect()
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("n_occupied")))
        .maxBy(_._1)
      assert(last._1 == 3L, s"events: $last")
      assert(last._2 == 2L,
        s"occupied double-counted on late re-open: $last")
    } finally q.stop()
  }

  test("streaming changepoint monitor: the final per-type report is " +
      "BIT-EQUAL to the batch q_evt_changepoint over the same events, " +
      "one-shot and split (no horizon — a late event just lands)") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val base = 1700000000000L
    def evt(id: Long, tpe: String, minute: Long, sub: Int) =
      FanoEvt(id, new Timestamp(base + minute * 60000L + sub * 1000L),
        1L, tpe, 1.0)
    // "step": 2/min for 30 min then 8/min for 30; "flat": 3/min
    val all =
      (0 until 30).flatMap(m => (0 until 2).map(i =>
        evt(1000 + m * 10 + i, "step", m.toLong, i))) ++
      (30 until 60).flatMap(m => (0 until 8).map(i =>
        evt(2000 + m * 10 + i, "step", m.toLong, i))) ++
      (0 until 60).flatMap(m => (0 until 3).map(i =>
        evt(4000 + m * 10 + i, "flat", m.toLong, i)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_chgm").toString
    all.toDF().withColumn("props", lit("{}"))
      .write.parquet(s"$tmp/events.parquet")
    val want = graft.operators.Events.qEvtChangepoint(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("split_minute"),
          r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
          r.getAs[Long]("llr_scaled"))))
      .toMap
    def run(batches: Seq[Seq[FanoEvt]], name: String)
        : Map[String, (Long, Long, Long, Long, Long)] = {
      val mem = MemoryStream[FanoEvt]
      val q = graft.streaming.Streams.changepointMonitor(spark, mem.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getAs[String]("event_type"),
            r.getAs[Long]("n_events"), r.getAs[Long]("split_minute"),
            r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
            r.getAs[Long]("llr_scaled")))
          .groupBy(_._1).view
          .mapValues { rows =>
            val l = rows.maxBy(_._2)
            (l._2, l._3, l._4, l._5, l._6)
          }.toMap
      } finally q.stop()
    }
    val oneShot = run(Seq(all), "chgpt_one")
    assert(oneShot.keySet == want.keySet)
    oneShot.foreach { case (k, got) =>
      assert(got == want(k), s"$k: stream $got vs batch ${want(k)}")
    }
    // an out-of-order split (late minutes interleaved) converges to the
    // same final report — the count-map state has no horizon
    val shuffled = new scala.util.Random(7).shuffle(all)
    val split = run(Seq(shuffled.take(100), shuffled.slice(100, 300),
      shuffled.drop(300)), "chgpt_split")
    assert(split == oneShot, s"split diverged: $split vs $oneShot")
    // the planted step localizes at the boundary minute
    val m0 = 1700000000L / 60
    assert(oneShot("step")._2 == m0 + 29, oneShot("step").toString)
  }
}
