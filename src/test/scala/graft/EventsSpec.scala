package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends GraftSpec {

  test("events loader yields microsecond timestamps (ns truncated)") {
    val e = Events.events(spark, sf)
    assert(e.schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(e.count() > 0)
  }

  test("sessionize: session count per user matches a driver-side replay") {
    val evts = Events.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evts.groupBy(_._1).map { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).toList
      val gaps = sorted.zip(sorted.drop(1))
        .count { case (a, b) => b._2 - a._2 > 30L * 60 * 1000000 }
      uid -> (gaps + 1)
    }
    val got = Events.qEvtSessionize(spark, sf)
      .groupBy("user_id").agg(countDistinct("session_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
  }

  test("as-of join: matched signup precedes the purchase") {
    val rows = Events.qEvtAsof(spark, sf)
      .filter(col("last_signup_ts").isNotNull)
      .select(col("ts").cast("long"), col("last_signup_ts").cast("long"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0)))
  }

  test("keep-latest dedup has one row per (user, type)") {
    val out = Events.qEvtDedupLatest(spark, sf)
    assert(out.count() ==
      out.select("user_id", "event_type").distinct().count())
  }

  test("robust median/MAD report equals a driver-side order-statistic " +
      "reference, Hampel outlier counts included") {
    val vals = Events.events(spark, sf)
      .select(col("event_type"),
        (col("value").cast("decimal(12,4)") * 10000).cast("long").as("v4"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    def med2(xs: Seq[Long]): Long = {
      val n = xs.size
      xs((n + 1) / 2 - 1) + xs((n + 2) / 2 - 1) // 1-based (n+1)/2,(n+2)/2
    }
    val want = vals.map { case (t, xs) =>
      val m2 = med2(xs)
      val ds = xs.map(x => math.abs(2 * x - m2)).sorted
      val mad2 = med2(ds)
      val out = ds.count(d => 2 * d > 3 * mad2).toLong
      t -> ((xs.size.toLong, m2, mad2, out))
    }
    val got = Events.qEvtMad(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("med2"),
          r.getAs[Long]("mad2"), r.getAs[Long]("n_outliers"))))
      .toMap
    assert(got == want, s"got $got\nwant $want")
    // the robust gate is live on this corpus (some outliers somewhere)
    assert(got.values.map(_._4).sum > 0, "no outliers anywhere is implausible")
  }

  test("lag-1 autocorrelation equals a driver-side exact BigInt replay") {
    val series = Events.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(12,4)") * 10000).cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(t => (t._1.getTime, t._2)).map(_._3))
      .toMap
    val want = series.flatMap { case (u, vs) =>
      val n = BigInt(vs.size)
      val sv = vs.map(BigInt(_)).sum
      val c = vs.map(v => n * v - sv)
      val den = c.map(x => x * x).sum
      if (den == 0) None
      else {
        val num = c.zip(c.tail).map { case (a, b) => a * b }.sum
        Some(u -> ((vs.size.toLong, (BigInt(1000000) * num / den).toLong)))
      }
    }
    val got = Events.qEvtAutocorr(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("r1_scaled")))).toMap
    assert(got == want, s"got ${got.toSeq.sortBy(_._1).take(4)}\n" +
      s"want ${want.toSeq.sortBy(_._1).take(4)}")
    assert(got.nonEmpty)
  }

  test("Fano factor equals a driver-side exact replay (zero bins implicit)") {
    val counts = Events.events(spark, sf)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).map { case (_, g) => g.size.toLong }.toSeq)
      .toMap
    val minMax = Events.events(spark, sf)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(ms => (ms.map(_._2).min, ms.map(_._2).max))
      .toMap
    val want = counts.flatMap { case (t, cs) =>
      val (lo, hi) = minMax(t)
      val k = BigInt(hi - lo + 1)
      val sTot = BigInt(cs.sum)
      val sc2 = cs.map(c => BigInt(c) * c).sum
      if (k < 2) None
      else Some(t -> ((cs.sum, hi - lo + 1, cs.size.toLong,
        (BigInt(1000000) * (k * sc2 - sTot * sTot)
          / ((k - 1) * sTot)).toLong)))
    }
    val got = Events.qEvtFano(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_minutes"),
          r.getAs[Long]("n_occupied"), r.getAs[Long]("fano_scaled")))).toMap
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty)
  }

  test("periodicity: best lag equals a driver-side exact multi-lag replay") {
    val series = Events.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(12,4)") * 10000).cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(t => (t._1.getTime, t._2)).map(_._3))
      .toMap
    val L = Events.AcfLagMax
    val want = series.flatMap { case (u, vs) =>
      val n = BigInt(vs.size)
      val sv = vs.map(BigInt(_)).sum
      val c = vs.map(v => n * v - sv).toIndexedSeq
      val den = c.map(x => x * x).sum
      if (vs.size <= L || den == 0) None
      else {
        val nums = (1 to L).map(k =>
          (0 until c.size - k).map(t => c(t) * c(t + k)).sum)
        // earliest-lag argmax: k wins iff strictly beats all earlier
        // and ties-or-beats all later
        val best = (1 to L).find(k =>
          (1 until k).forall(i => nums(k - 1) > nums(i - 1)) &&
            (k + 1 to L).forall(i => nums(k - 1) >= nums(i - 1))).get
        Some(u -> ((vs.size.toLong, best,
          (BigInt(1000000) * nums(best - 1) / den).toLong)))
      }
    }
    val got = Events.qEvtPeriodicity(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Int]("best_lag"),
          r.getAs[Long]("r_scaled")))).toMap
    assert(got == want, s"got ${got.toSeq.sortBy(_._1).take(4)}\n" +
      s"want ${want.toSeq.sortBy(_._1).take(4)}")
    assert(got.nonEmpty)
  }

  test("burst detection equals a driver-side sliding-window replay " +
      "(gap-proof range frame, earliest peaking minute)") {
    val W = Events.BurstWindowMin
    val byType = Events.events(spark, sf)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 60).cast("long").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val want = byType.map { case (t, cnt) =>
      // reference: for every OCCUPIED minute m, the sum over [m-4, m]
      // (a window can only peak at an occupied right edge)
      val sums = cnt.keys.map(m =>
        m -> (m - (W - 1) to m).map(cnt.getOrElse(_, 0L)).sum).toMap
      val peak = sums.values.max
      t -> ((cnt.values.sum, peak,
        sums.collect { case (m, s) if s == peak => m }.min))
    }
    val got = Events.qEvtBurst(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("peak_count"),
          r.getAs[Long]("peak_minute")))).toMap
    assert(got == want, s"got $got\nwant $want")
    // peak is at least the densest single minute, at most n
    got.foreach { case (t, (n, p, _)) =>
      assert(p >= byType(t).values.max && p <= n) }
  }

  test("interarrival rate equals a driver-side exact replay") {
    val byType = Events.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(identity).map(_._1)).toMap
    val want = byType.flatMap { case (t, us) =>
      val gaps = us.zip(us.tail).map { case (a, b) => b - a }
      val sdt = gaps.sum
      if (gaps.isEmpty || sdt <= 0) None
      else Some(t -> ((us.size.toLong, sdt, gaps.max, gaps.min,
        (BigInt("1000000000000") * gaps.size / sdt).toLong)))
    }
    val got = Events.qEvtRate(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("sum_dt_us"),
          r.getAs[Long]("max_gap_us"), r.getAs[Long]("min_gap_us"),
          r.getAs[Long]("rate_scaled")))).toMap
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty)
  }

  test("periodicity: a planted period-4 series reports best_lag = 4") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_period").toString
    // one user, 48 events on a strict period-4 sawtooth; a second user
    // of white-ish noise must not leak into the first's report
    val base = 1700000000000000L
    val rows =
      (0 until 48).map { i =>
        (i.toLong, base + i * 60000000L, 1L, "click",
          Seq(10.0, 20.0, 30.0, 40.0)(i % 4), "{}")
      } ++ (0 until 48).map { i =>
        (100L + i, base + i * 60000000L, 2L, "view",
          ((i * 2654435761L) % 97).toDouble, "{}")
      }
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.qEvtPeriodicity(spark, tmp).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("best_lag"), r.getAs[Long]("r_scaled")))).toMap
    assert(got(1L)._1 == 4, s"planted period-4 user got ${got(1L)}")
    assert(got(1L)._2 > 900000, // ACF at the true period is ~1
      s"planted periodic series should show r ≈ 1, got ${got(1L)}")
  }

  test("changepoint: a planted rate step (2/min for 100 min, then " +
      "10/min) localizes at the step boundary with a large llr; a " +
      "homogeneous stream reports ~zero llr") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_chgpt").toString
    val base = 1700000000000000L
    def evts(tag: String, minute: Int, k: Int, off: Long) =
      (0 until k).map(j => (off + minute.toLong * 100 + j,
        base + minute * 60000000L + j * 1000000L, 1L, tag, 1.0, "{}"))
    val stepped = (0 until 100).flatMap(m => evts("step", m, 2, 0L)) ++
      (100 until 200).flatMap(m => evts("step", m, 10, 1000000L))
    val flat = (0 until 200).flatMap(m => evts("flat", m, 4, 2000000L))
    (stepped ++ flat)
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.qEvtChangepoint(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("split_minute"), r.getAs[Long]("n_left"),
          r.getAs[Long]("n_right"), r.getAs[Double]("llr"))))
      .toMap
    val st = got("step")
    // the boundary after minute 99 splits 200 left / 1000 right
    val m0 = base / 60000000L
    assert(st._1 == m0 + 99, s"split localized at ${st._1 - m0}, want 99")
    assert(st._2 == 200L && st._3 == 1000L, st.toString)
    // llr ≈ n1·ln(r1/r) + n2·ln(r2/r) with r1=2, r2=10, r=6:
    // 200·ln(1/3) + 1000·ln(5/3) ≈ 291 — decisive; homogeneous ≈ 0
    assert(st._4 > 200.0, s"step llr too small: $st")
    assert(math.abs(got("flat")._4) < 10.0,
      s"homogeneous stream shows spurious llr: ${got("flat")}")
  }
}
