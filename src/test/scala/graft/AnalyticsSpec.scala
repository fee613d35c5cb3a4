package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends GraftSpec {

  test("q_evt_m4's decimal ordering pack is a bijection on this corpus " +
      "(event_id < 10^18, ts in [1970, 5138)) — the packing invariant") {
    import org.apache.spark.sql.functions._
    val b = graft.operators.Events.events(spark, sf)
      .agg(min(col("event_id")), max(col("event_id")),
        min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    assert(b.getLong(0) >= 0L && b.getLong(1) < 1000000000000000000L,
      s"event_id out of packing range: [${b.getLong(0)}, ${b.getLong(1)}]")
    assert(b.getLong(2) >= 0L && b.getLong(3) < 100000000000000000L * 1000L,
      s"ts out of packing range")
  }


  test("fkEdge counts orphans and null keys on injected-dirty data") {
    val ss = spark
    import ss.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val r = Analytics.fkEdge("child.fk->parent", child, "fk", parent, "pk")
      .collect().head
    assert(r.getString(0) == "child.fk->parent")
    assert(r.getLong(1) == 5L) // all child rows counted
    assert(r.getLong(2) == 2L) // the 99 orphan + the null key
  }

  test("q_fk_check reports every edge clean on the consistent corpus") {
    val rows = Analytics.qFkCheck(spark, sf).collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getLong(2) == 0L),
      rows.filter(_.getLong(2) != 0L).mkString(","))
  }

  test("gapfill grid is complete, zero-filled, and forward-fill carries") {
    val out = Analytics.qEvtGapfill(spark, sf).cache()
    val types = out.select("event_type").distinct().count()
    val hours = out.select("hour_start").distinct().count()
    assert(out.count() == types * hours) // full grid, no holes
    // zero-filled rows: count 0, sum 0, ffill either null (before the
    // type's first active hour) or the last active hour's sum
    val ev = graft.operators.Events.events(spark, sf)
    val total = ev.count()
    assert(out.agg(sum("n_events")).head.getLong(0) == total) // conservation
    // forward-fill: on rows with events, ffill_sum == sum_value
    val active = out.filter(col("n_events") > 0)
      .filter(col("ffill_sum") =!= col("sum_value")).count()
    assert(active == 0L)
    // and on gap rows it equals the previous active row's sum (spot check
    // via a self-join on the lag of active sums)
    val gaps = out.filter(col("n_events") === 0 && col("ffill_sum").isNotNull)
    assert(gaps.filter(col("sum_value") =!= 0.0).count() == 0L)
    out.unpersist()
  }

  test("retention week 0 covers every user once per cohort") {
    val out = Analytics.qEvtRetention(spark, sf).cache()
    val ev = graft.operators.Events.events(spark, sf)
    val users = ev.select("user_id").distinct().count()
    // every user appears in their cohort's offset-0 cell exactly once
    val w0 = out.filter(col("week_offset") === 0)
      .agg(sum("n_users")).head.getLong(0)
    assert(w0 == users)
    // offsets are non-negative and n_users never exceeds the cohort size
    assert(out.filter(col("week_offset") < 0).count() == 0L)
    val cohorts = out.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    val over = out.join(cohorts, "cohort_week")
      .filter(col("n_users") > col("cohort_size")).count()
    assert(over == 0L)
    out.unpersist()
  }

  test("PSI drift: self-comparison ~0, a shifted distribution alarms, " +
      "counts conserve rows") {
    import graft.operators.Analytics
    val sess = spark
    import sess.implicits._
    val a = (1 to 4000).map(i => (i % 100).toDouble).toDF("v")
    val same = Analytics.psiReport(a, a, "v", 0, 100, 10).collect()
    val psiSame = same.filter(_.getInt(0) == -1).head.getDouble(4)
    assert(math.abs(psiSame) < 1e-6, s"self-PSI $psiSame")
    // a hard shift: second population lives in the top half only
    val b = (1 to 4000).map(i => 50.0 + (i % 50)).toDF("v")
    val out = Analytics.psiReport(a, b, "v", 0, 100, 10).collect()
    val psi = out.filter(_.getInt(0) == -1).head.getDouble(4)
    assert(psi > 0.25, s"shifted PSI $psi below the drift threshold")
    // exact conservation: bin counts sum to the populations
    val cells = out.filter(_.getInt(0) >= 0)
    assert(cells.map(_.getLong(2)).sum == 4000L)
    assert(cells.map(_.getLong(3)).sum == 4000L)
    // clamping: values at the edges stay counted
    val edge = Analytics.psiReport(a, b, "v", 20, 80, 6).collect()
      .filter(_.getInt(0) >= 0)
    assert(edge.map(_.getLong(2)).sum == 4000L, "out-of-range rows lost")
  }

  test("CUSUM closed form ≡ the textbook max(0, S+d) recursion; a planted " +
      "level shift alarms only after the shift; flat series never alarms") {
    val sp = spark; import sp.implicits._
    import java.sql.Timestamp
    def series(uid: Long, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) =>
        (uid * 1000 + i, uid, new Timestamp(1700000000000L + i * 1000L), v)
    }
    // user 1: baseline 10.0 then a +100 level shift (the detection case);
    // user 2: flat (never alarms); user 3: deterministic sawtooth noise
    // (exercises the reset-to-zero path of the recursion repeatedly)
    val fixtures = Map(
      1L -> (Seq.fill(30)(10.0) ++ Seq.fill(10)(110.0)),
      2L -> Seq.fill(40)(50.0),
      3L -> (0 until 60).map(i => (i * 37 % 97).toDouble))
    val df = fixtures.toSeq.flatMap { case (u, vs) => series(u, vs) }
      .toDF("event_id", "user_id", "ts", "value")
    val got = Analytics.cusumScores(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getDouble(4)))).toMap
    // independent local reference: the TEXTBOOK recursion on the same
    // integerized model (the operator computes the prefix-sum closed form)
    def ref(uid: Long, vs: Seq[Double]) = {
      val vi = vs.map(v => (BigDecimal(v)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLongExact)
      val n = vi.size.toLong
      val tot = vi.sum
      var s = 0L; var alarms = 0L; var first: Option[Long] = None
      var maxS = 0L
      vi.indices.foreach { i =>
        val d = n * (vi(i) - Analytics.CusumAllowScaled) - tot
        s = math.max(0L, s + d)
        maxS = math.max(maxS, s)
        if (s > n * Analytics.CusumThreshScaled) {
          alarms += 1
          if (first.isEmpty) first = Some(uid * 1000 + i)
        }
      }
      (n, alarms, first, maxS.toDouble / (n * 10000L).toDouble)
    }
    fixtures.foreach { case (u, vs) =>
      assert(got(u) == ref(u, vs), s"user $u: got ${got(u)}, ref ${ref(u, vs)}")
    }
    assert(got(1L)._2 > 0, "level shift must alarm")
    assert(got(1L)._3.get >= 1030L, "no alarm before the shift")
    assert(got(2L)._2 == 0 && got(2L)._4 == 0.0, "flat series must not alarm")
  }

  test("CUSUM long-history widening: a 30k-event series whose " +
      "n-multiplied prefix sums leave the BIGINT range still equals the " +
      "textbook recursion (the r14 DECIMAL(38,0)/HUGEINT path)") {
    val sp = spark; import sp.implicits._
    import java.sql.Timestamp
    // 15k baseline-0 events then 15k at 1e7: dev ≈ ∓1.5e15 per row,
    // so |P| peaks ≈ 2.25e19 — past Long.MaxValue (9.2e18); the old
    // BIGINT pipeline would wrap, the widened one must stay exact
    val vs = Seq.fill(15000)(0.0) ++ Seq.fill(15000)(1.0e7)
    val df = vs.zipWithIndex.map { case (v, i) =>
      (1000000L + i, 7L, new Timestamp(1700000000000L + i * 1000L), v)
    }.toDF("event_id", "user_id", "ts", "value")
    // BigInt textbook recursion — the independent reference
    val vi = vs.map(v => BigInt((BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLongExact))
    val n = BigInt(vi.size)
    val tot = vi.sum
    var s = BigInt(0); var alarms = 0L; var first: Option[Long] = None
    var maxS = BigInt(0); var minP = BigInt(0); var p = BigInt(0)
    vi.indices.foreach { i =>
      val dv = n * (vi(i) - Analytics.CusumAllowScaled) - tot
      p += dv
      if (p < minP) minP = p
      s = (s + dv).max(BigInt(0))
      if (s > maxS) maxS = s
      if (s > n * Analytics.CusumThreshScaled) {
        alarms += 1
        if (first.isEmpty) first = Some(1000000L + i)
      }
    }
    assert(minP < BigInt(Long.MinValue) || maxS > BigInt(Long.MaxValue),
      s"fixture too small to exercise the widening: minP $minP maxS $maxS")
    val got = Analytics.cusumScores(df).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == vi.size.toLong)
    assert(r.getLong(2) == alarms, s"alarms ${r.getLong(2)} vs $alarms")
    assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == first)
    val wantMax = maxS.toDouble / (vi.size.toLong * 10000L).toDouble
    assert(math.abs(r.getDouble(4) - wantMax) <= math.ulp(wantMax) * 4,
      s"max_cusum ${r.getDouble(4)} vs $wantMax")
  }

  test("association rules equal a driver-side brute force over the " +
      "baskets, ordering and integer scores included") {
    import graft.operators.Analytics
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nOrders = baskets.map(_._1).size.toLong
    val ci = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val byOrder = baskets.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val cab = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { pks =>
      for (i <- pks.indices; j <- i + 1 until pks.size)
        cab((pks(i), pks(j))) = cab.getOrElse((pks(i), pks(j)), 0L) + 1
    }
    def divq(num: BigInt, den: BigInt): Long = (num / den).toLong
    val want = cab.toSeq
      .filter(_._2 >= Analytics.AssocMinSupport)
      .map { case ((a, b), c) =>
        (a, b, c, divq(BigInt(1000000) * c, nOrders),
          divq(BigInt(1000000) * c, ci(a)),
          divq(BigInt(1000000) * nOrders * c, BigInt(ci(a)) * ci(b)))
      }
      .sortBy { case (a, b, _, _, _, lift) => (-lift, a, b) }
      .take(20)
    val got = Analytics.qAssocRules(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("n_ab"), r.getAs[Long]("support_scaled"),
        r.getAs[Long]("confidence_scaled"), r.getAs[Long]("lift_scaled")))
      .toSeq
    assert(got == want, s"got ${got.take(4)}\nwant ${want.take(4)}")
  }

  test("benford audit: shares sum to 1, digits partition the nonzero " +
      "events, deviations match the integer identity, and a planted " +
      "Benford-ish set scores near-zero deviation") {
    import graft.operators.{Analytics, Events}
    val rows = Analytics.qEvtBenford(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val nTotal = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nTotal)
    val nonzero = Events.events(spark, sf)
      .filter(col("value").cast("decimal(12,4)") * 10000 =!= 0).count()
    assert(nTotal == nonzero)
    rows.foreach { r =>
      val want = math.abs(r.getAs[Long]("n_obs") * 1000000L -
        r.getAs[Long]("expected_scaled"))
      assert(r.getAs[Long]("dev_scaled") == want)
    }
    val shares = rows.map(_.getAs[Double]("observed_share")).sum
    assert(math.abs(shares - 1.0) < 1e-9)
    // the constants themselves: Σ floor(1e6·log10(1+1/d)) ≈ 1e6
    val csum = Analytics.BenfordScaled.sum
    assert(csum > 999990L && csum <= 1000000L, s"constants sum $csum")
  }
}