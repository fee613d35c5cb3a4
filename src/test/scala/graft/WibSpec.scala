package graft

import graft.functions.{GraftFunctions, WibFrame}
import graft.operators.Wib
import graft.tools.WibGen
import org.apache.spark.sql.functions._

class WibSpec extends GraftSpec {

  test("wib_decode round-trips the generator layout (codegen path)") {
    val sess = spark; import sess.implicits._
    val frames = for (s <- 0 until 3; f <- 0 until 5)
      yield (s * 5L + f, WibGen.payload(s, f))
    val rows = frames.toDF("frame_id", "payload")
      .select(col("frame_id"), GraftFunctions.wibDecode(col("payload")).as("d"))
      .select(col("frame_id"), col("d.src_id"), col("d.ts"), col("d.samples"))
      .collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val fid = r.getLong(0)
      val (srcId, fIdx) = (fid / 5, (fid % 5).toInt)
      assert(r.getLong(1) == srcId, "src_id header field")
      assert(r.getLong(2) == 62_500_000_000L + fIdx * WibGen.TickStep, "ts header field")
      val samples = r.getSeq[Int](3)
      assert(samples.length == WibFrame.Channels * WibFrame.TicksPerChannel)
      // independent reference decode: u16 LE straight off the bytes
      val bytes = WibGen.payload(srcId.toInt, fIdx)
      samples.zipWithIndex.foreach { case (v, j) =>
        val off = WibFrame.HeaderBytes + 2 * j
        val ref = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
        assert(v == ref, s"sample $j")
      }
    }
  }

  test("wib_decode yields null for malformed payloads, not an exception") {
    val sess = spark; import sess.implicits._
    val bad = Seq(
      Array[Byte](),                      // empty
      Array[Byte](1, 2, 3),               // short header
      new Array[Byte](WibFrame.HeaderBytes + 3)) // torn trailing sample byte
    val out = bad.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
      .select(GraftFunctions.wibDecode(col("payload")).as("d"))
      .collect()
    assert(out.forall(_.isNullAt(0)), "malformed frames must decode to null")
  }

  test("wib_decode handles u16 extremes and u32/u64 header ranges") {
    val sess = spark; import sess.implicits._
    // src_id with the high bit of byte 3 set (unsigned u32 > Int.MaxValue),
    // samples at 0 and 65535
    val bytes = new Array[Byte](WibFrame.HeaderBytes + 4)
    bytes(0) = 0xff.toByte; bytes(3) = 0x80.toByte // src_id = 0x800000FF
    bytes(11) = 0x10.toByte                        // ts has a high byte
    bytes(12) = 0; bytes(13) = 0                   // sample 0 = 0
    bytes(14) = 0xff.toByte; bytes(15) = 0xff.toByte // sample 1 = 65535
    val r = Seq((1L, bytes)).toDF("id", "payload")
      .select(GraftFunctions.wibDecode(col("payload")).as("d"))
      .select(col("d.src_id"), col("d.ts"), col("d.samples")).collect().head
    assert(r.getLong(0) == 0x800000FFL)
    assert(r.getLong(1) == 0x10L << 56)
    assert(r.getSeq[Int](2) == Seq(0, 65535))
  }

  test("q_wib_pedestal: one row per channel, exact stats vs driver-side decode") {
    val out = Wib.qWibPedestal(spark, sf).collect()
    assert(out.length == WibGen.Streams * WibFrame.Channels)
    // recompute channel 0 stats from the generator directly
    val samples = for {
      f <- 0 until WibGen.FramesPerStream
      bytes = WibGen.payload(0, f)
      j <- 0 until (WibFrame.Channels * WibFrame.TicksPerChannel)
      if j % WibFrame.Channels == 0
    } yield {
      val off = WibFrame.HeaderBytes + 2 * j
      ((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)).toLong
    }
    val row = out.find(r => r.getAs[Long]("channel") == 0L).get
    assert(row.getAs[Long]("n_samples") == samples.length)
    val mean = samples.sum.toDouble / samples.length
    assert(row.getAs[Double]("mean_adc") == mean)
    val rms = math.sqrt(samples.map(s => s * s).sum.toDouble / samples.length - mean * mean)
    assert(row.getAs[Double]("rms_adc") == rms)
    assert(row.getAs[Long]("peak_adc") == samples.max)
    // dromap join: channel 0 is stream 0 → crate 8, slot 2, det 3
    assert(row.getAs[Int]("det_id") == 3)
    assert(row.getAs[Int]("crate_id") == 8)
    assert(row.getAs[Int]("slot_id") == 2)
  }

  test("hit finding equals a driver-side reference over the committed " +
      "fixture: pedestal subtraction, threshold runs, charge and peaks") {
    val c = WibFrame.Channels
    val t = WibFrame.TicksPerChannel
    val frames = Wib.frames(spark).collect()
      .map(_.getAs[Array[Byte]]("payload"))
    // reference decode + hit finder, straight off the bytes
    case class Hit(src: Long, ch: Long, width: Long, charge: Long, peak: Long)
    val hits = frames.flatMap { b =>
      val src = (0 until 4).map(k => (b(k) & 0xffL) << (8 * k)).sum
      val samples = Array.tabulate(c * t) { j =>
        val off = WibFrame.HeaderBytes + 2 * j
        ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toLong
      }
      (0 until c).flatMap { ch =>
        val series = Array.tabulate(t)(tk => samples(tk * c + ch))
        val p = series.sum
        val hot = series.zipWithIndex
          .filter { case (s, _) => t * s - p > t * Wib.HitThresholdAdc }
        // group consecutive ticks into runs
        val runs = hot.foldLeft(List.empty[List[(Long, Int)]]) {
          case (acc, (s, tk)) => acc match {
            case (h @ ((_, prev) :: _)) :: rest if tk == prev + 1 =>
              ((s, tk) :: h) :: rest
            case _ => List((s, tk)) :: acc
          }
        }
        runs.map { r =>
          Hit(src, src * c + ch, r.size.toLong,
            r.map { case (s, _) => t * s - p }.sum,
            r.map(_._1).max)
        }
      }
    }
    val want = hits.groupBy(h => (h.src, h.ch)).map { case ((_, ch), hs) =>
      ch -> ((hs.size.toLong, hs.map(_.width).sum, hs.map(_.charge).sum,
        hs.map(_.peak).max))
    }
    val got = Wib.qWibHits(spark, sf).collect()
      .map(r => r.getAs[Long]("channel") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_hit_ticks"),
          r.getAs[Long]("charge_scaled"), r.getAs[Long]("peak_adc"))))
      .toMap
    assert(got == want,
      s"hits mismatch: got ${got.toSeq.sortBy(_._1).take(6)} " +
        s"want ${want.toSeq.sortBy(_._1).take(6)}")
    assert(got.nonEmpty, "fixture must contain planted pulses")
    assert(got.values.map(_._1).sum > 0)
  }

  test("channel status equals a driver-side exact integer reference " +
      "(quantized variances, doubled median, Hampel gate)") {
    val c = WibFrame.Channels
    val t = WibFrame.TicksPerChannel
    // reference: per-channel samples straight off the generator bytes
    val byChannel = (for {
      s <- 0 until WibGen.Streams
      f <- 0 until WibGen.FramesPerStream
      bytes = WibGen.payload(s, f)
      j <- 0 until (c * t)
    } yield {
      val off = WibFrame.HeaderBytes + 2 * j
      val v = ((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)).toLong
      (s.toLong * c + j % c, v)
    }).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val qOf = byChannel.view.mapValues { ss =>
      val n = BigInt(ss.size)
      val a = n * ss.map(x => BigInt(x) * x).sum -
        ss.map(BigInt(_)).sum * ss.map(BigInt(_)).sum
      (a, (BigInt(1000000) * a / (n * n)).toLong)
    }.toMap
    val sorted = qOf.toSeq.map { case (ch, (_, q)) => (q, ch) }.sorted
    val k = sorted.size
    val med2q = sorted((k + 1) / 2 - 1)._1 + sorted((k + 2) / 2 - 1)._1
    val want = qOf.map { case (ch, (a, q)) =>
      ch -> ((byChannel(ch).size.toLong, q,
        if (a == 0) "dead" else if (q > 2 * med2q) "noisy" else "good"))
    }
    val got = Wib.qWibBadchannels(spark, sf).collect()
      .map(r => r.getAs[Long]("channel") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("var_scaled"),
          r.getAs[String]("status")))).toMap
    assert(got == want, s"first diffs: ${
      got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
        .filter(p => p._1 != p._2).take(3)}")
    assert(got.size == WibGen.Streams * c)
    // the fixture's planted-pulse channels carry real variance; nothing
    // in it is stuck, so no dead channels — and the med2q column agrees
    assert(got.values.forall(_._3 != "dead"))
    val medCol = Wib.qWibBadchannels(spark, sf)
      .select("med2q").distinct().collect()
    assert(medCol.length == 1 && medCol(0).getLong(0) == med2q)
  }

  test("q_wib_noise_fft: one-sided per-channel power equals a brute " +
      "O(N^2) DFT over an independently decoded window; one peak bin " +
      "per channel") {
    val out = Wib.qWibNoiseFft(spark, sf).collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getDouble(5),
        r.getBoolean(6)))
    val byCh = out.groupBy(_._1)
    assert(byCh.nonEmpty)
    byCh.foreach { case (ch, rows) =>
      assert(rows.length == Wib.NoiseFftN / 2, s"bins for channel $ch")
      assert(rows.count(_._4) == 1, s"peak count for channel $ch")
    }
    // independent reference: raw payload bytes decoded by hand (u32 LE
    // src, u64 LE ts, u16 LE samples), per-channel (ts, j)-ordered
    // window, mean subtraction, brute DFT
    val payloads = spark.read
      .parquet(graft.sources.Configs.absDir(Wib.FramesPath))
      .collect().map(_.getAs[Array[Byte]]("payload"))
    val series = scala.collection.mutable.Map[Long,
      scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]]()
    payloads.foreach { b =>
      val src = (0 until 4).map(i => (b(i) & 0xffL) << (8 * i)).sum
      val ts = (0 until 8).map(i => (b(4 + i) & 0xffL) << (8 * i)).sum
      val n = (b.length - graft.functions.WibFrame.HeaderBytes) / 2
      (0 until n).foreach { j =>
        val off = graft.functions.WibFrame.HeaderBytes + 2 * j
        val v = ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toDouble
        val ch = src * graft.functions.WibFrame.Channels +
          j % graft.functions.WibFrame.Channels
        series.getOrElseUpdate(ch,
          scala.collection.mutable.ArrayBuffer.empty) += ((ts, j.toLong, v))
      }
    }
    series.keys.toSeq.sorted.take(2).foreach { ch =>
      val w = series(ch).sortBy(r => (r._1, r._2)).take(Wib.NoiseFftN)
        .map(_._3).toArray
      assert(w.length == Wib.NoiseFftN)
      val mean = w.sum / w.length
      val x = w.map(_ - mean)
      val got = byCh(ch).sortBy(_._2).map(_._3)
      (1 to Wib.NoiseFftN / 2).foreach { k =>
        var re = 0.0; var im = 0.0
        x.indices.foreach { t =>
          val a = -2.0 * math.Pi * k * t / Wib.NoiseFftN
          re += x(t) * math.cos(a); im += x(t) * math.sin(a)
        }
        val ref = re * re + im * im
        val g = got(k - 1)
        assert(math.abs(g - ref) <= 1e-6 * math.max(1.0, math.abs(ref)),
          s"channel $ch bin $k: $g vs $ref")
      }
    }
    // the window bounds BEFORE the per-channel shuffle (r16 advisor):
    // the plan must carry the TopKPerGroup frame pre-cut, so no task
    // ever buffers a channel's full history
    val plan = Wib.qWibNoiseFft(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"),
      s"noise-fft plan lost the bounded frame pre-cut:\n$plan")
  }

  test("the frame scan stays in whole-stage codegen (no UDF boundary)") {
    val df = Wib.qWibPedestal(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"decode stage must be codegen'd:\n${plan.take(500)}")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("MapPartitions"),
      "no UDF/lambda boundary in the frame scan")
  }
}
