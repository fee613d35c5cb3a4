package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends GraftSpec {

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(spark, sf)
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val n = media.count()
    assert(n == Tables.documents(spark, sf).count())
    assert(media.select("meta.kind").distinct().count() == 3)
  }

  test("feature extraction is deterministic and histogram sums to byte count") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
    feats.foreach { f =>
      assert(f.histogram.sum == f.n_bytes)
      assert(f.mean_intensity > 0 && f.mean_intensity < 256)
    }
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
    assert(feats.map(f => f.media_id -> f.mean_intensity).toMap ==
      again.map(f => f.media_id -> f.mean_intensity).toMap)
  }

  test("resize caps payloads and patches metadata consistently") {
    val media = Multimodal.mediaTable(spark, sf)
    val orig = media.collect().map(m => m.media_id -> m).toMap
    val resized = Multimodal.resize(media, 64).collect()
    resized.foreach { m =>
      assert(m.payload.length <= 64)
      val o = orig(m.media_id)
      if (o.payload.length > 64) {
        assert(m.meta.width == math.max(1, o.meta.width / 2))
        assert(m.payload.sameElements(o.payload.take(64)))
      } else assert(m.meta == o.meta)
    }
  }

  test("REAL image resize: fits the box, preserves aspect, small/undecodable pass through") {
    val media = Multimodal.pngMediaTable(spark, 20)
    val orig = media.collect().map(m => m.media_id -> m).toMap
    val (maxW, maxH) = (16, 16)
    val out1 = Multimodal.resizeImages(media, maxW, maxH).collect()
      .map(m => m.media_id -> m).toMap
    out1.values.foreach { m =>
      val o = orig(m.media_id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.payload))
      assert(img.getWidth <= maxW && img.getHeight <= maxH)
      assert(img.getWidth == m.meta.width && img.getHeight == m.meta.height,
        "metadata must match the actual re-encoded dimensions")
      if (o.meta.width <= maxW && o.meta.height <= maxH)
        assert(m.payload.sameElements(o.payload), "in-box image must pass through")
      else {
        // aspect preserved: the scale that fit the binding dimension
        val scale = math.min(maxW.toDouble / o.meta.width,
          maxH.toDouble / o.meta.height)
        assert(m.meta.width == math.max(1, math.floor(o.meta.width * scale).toInt))
        assert(m.meta.height == math.max(1, math.floor(o.meta.height * scale).toInt))
      }
    }
    // deterministic: a second distributed run is byte-identical
    val out2 = Multimodal.resizeImages(media, maxW, maxH).collect()
      .map(m => m.media_id -> m).toMap
    out1.foreach { case (id, m) =>
      assert(m.payload.sameElements(out2(id).payload)) }
    // an undecodable "image" payload passes through untouched
    val ss = spark
    import ss.implicits._
    val junk = Seq(Multimodal.MediaItem(999L,
      Multimodal.MediaMeta("image", 8, 8, 0, 0L),
      Array[Byte](1, 2, 3, 4))).toDS()
    val j = Multimodal.resizeImages(junk, maxW, maxH).head()
    assert(j.payload.sameElements(Array[Byte](1, 2, 3, 4)))
  }

  test("frame sampling decimates video payloads deterministically") {
    val media = Multimodal.mediaTable(spark, sf)
    val orig = media.collect().map(m => m.media_id -> m).toMap
    val sampled = Multimodal.frameSample(media, frameBytes = 16, everyNth = 2).collect()
    sampled.foreach { m =>
      val o = orig(m.media_id)
      if (o.meta.kind != "video") assert(m.payload.sameElements(o.payload))
      else {
        // kept frames are the even-indexed 16-byte slices of the original
        val expected = o.payload.grouped(16).zipWithIndex
          .collect { case (f, i) if i % 2 == 0 => f }.flatten.toArray
        assert(m.payload.sameElements(expected), s"media ${m.media_id}")
        assert(m.meta.durationMs == o.meta.durationMs / 2)
      }
    }
  }

  test("codec boundary: an injected container codec decodes distributed, byte-for-byte, opened once per partition") {
    import MultimodalSpec._
    // synthetic "container": FAKE magic + w/h header + w*h*3-byte frames —
    // deterministic per id, generated distributed like the PNG/GIF tables
    val sess = spark
    import sess.implicits._
    val media = sess.range(40).map { id =>
      Multimodal.MediaItem(id,
        Multimodal.MediaMeta("video", 4 + (id % 3).toInt, 3 + (id % 2).toInt,
          0, 0L),
        fakeContainer(id))
    }.repartition(4)
    val opens = sess.sparkContext.longAccumulator("codec_opens")
    val got = Multimodal.decodeVideo(media, everyNth = 2, FakeCodec(opens))
      .collect()
    // the codec's open() ran once per PARTITION, never per row
    assert(opens.value >= 1 && opens.value <= 4,
      s"codec opened ${opens.value} times for 4 partitions / 40 rows")
    // byte-for-byte vs a driver-side reference decode of the same bytes
    val byId = got.groupBy(_.media_id)
    (0L until 40L).foreach { id =>
      val frames = referenceFrames(id, everyNth = 2)
      val g = byId(id).sortBy(_.frame_idx)
      assert(g.length == frames.length, s"media $id frame count")
      g.zip(frames).foreach { case (a, (idx, w, h, px)) =>
        assert(a.frame_idx == idx && a.width == w && a.height == h
          && a.format == "rgb24" && a.pixels.sameElements(px),
          s"media $id frame $idx diverges")
      }
    }
    // junk bytes this codec cannot parse surface as data
    val junk = sess.range(3).map(id => Multimodal.MediaItem(id,
      Multimodal.MediaMeta("video", 0, 0, 0, 0L), Array[Byte](1, 2, 3)))
    val und = Multimodal.decodeVideo(junk, 1, FakeCodec(opens)).collect()
    assert(und.length == 3 && und.forall(_.format == "undecodable"))
    // and the DEFAULT implementation behind the same boundary is the
    // byte-slicing stub: same slices the legacy kernel produced
    val sliced = Multimodal.decodeVideo(media, 1,
      Multimodal.ByteSliceCodec(16)).collect()
    val payloads = media.collect().map(m => m.media_id -> m.payload).toMap
    sliced.groupBy(_.media_id).foreach { case (id, fs) =>
      val expected = payloads(id).grouped(16).toArray
      assert(fs.length == expected.length)
      fs.sortBy(_.frame_idx).zip(expected).foreach { case (f, e) =>
        assert(f.format == "bytes" && f.pixels.sameElements(e))
      }
    }
  }

  test("REAL PNG decode: distributed decodeImages is byte-for-byte the driver-side ImageIO decode") {
    val n = 12
    val decoded = Multimodal.decodeImages(Multimodal.pngMediaTable(spark, n))
      .collect().map(d => d.media_id -> d).toMap
    assert(decoded.size == n)
    (0 until n).foreach { id =>
      val d = decoded(id.toLong)
      // driver-side reference: same PNG bytes, decoded by ImageIO directly
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.pngBytes(id, 16 + (id % 5) * 8, 16 + (id % 3) * 8)))
      assert(d.format == "rgb24")
      assert(d.width == ref.getWidth && d.height == ref.getHeight)
      val expected = new Array[Byte](d.width * d.height * 3)
      var i = 0
      for (y <- 0 until d.height; x <- 0 until d.width) {
        val rgb = ref.getRGB(x, y)
        expected(i) = ((rgb >> 16) & 0xff).toByte
        expected(i + 1) = ((rgb >> 8) & 0xff).toByte
        expected(i + 2) = (rgb & 0xff).toByte
        i += 3
      }
      assert(d.pixels.sameElements(expected), s"pixel mismatch for media $id")
      // and the decoded pixels equal the pattern the PNG was encoded from
      // (PNG is lossless): spot-check a pixel from the pattern arithmetic
      val (r0, g0, b0) = (((0 * 7 + id * 13) % 256), ((0 * 11 + id * 17) % 256), (id % 256))
      assert((d.pixels(0) & 0xff) == r0 && (d.pixels(1) & 0xff) == g0
        && (d.pixels(2) & 0xff) == b0)
    }
  }

  test("REAL animated-GIF frame sampling: every-Nth decode matches driver-side frame reads") {
    val n = 8
    val everyNth = 2
    val sampled = Multimodal.decodeFrames(Multimodal.gifMediaTable(spark, n), everyNth)
      .collect().groupBy(_.media_id)
    assert(sampled.size == n)
    (0 until n).foreach { id =>
      val (w, h) = (16 + (id % 3) * 8, 16 + (id % 2) * 8)
      val frames = 3 + id % 4
      val got = sampled(id.toLong).sortBy(_.frame_idx)
      // every-Nth decimation: frames 0, 2, 4, ... of the stored sequence
      assert(got.map(_.frame_idx).toSeq == (0 until frames by everyNth),
        s"media $id sampled wrong frame set")
      // driver-side reference: the SAME gif bytes, frames read sequentially
      // (GIF quantizes to a palette, so the reference is a decode of the
      // bytes, never the pre-quantization pattern)
      val ios = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(Multimodal.gifBytes(id, w, h, frames)))
      val reader = javax.imageio.ImageIO.getImageReaders(ios).next()
      reader.setInput(ios)
      got.foreach { f =>
        val ref = reader.read(f.frame_idx)
        assert(f.format == "rgb24" && f.width == ref.getWidth && f.height == ref.getHeight)
        val expected = new Array[Byte](f.width * f.height * 3)
        var i = 0
        for (y <- 0 until f.height; x <- 0 until f.width) {
          val rgb = ref.getRGB(x, y)
          expected(i) = ((rgb >> 16) & 0xff).toByte
          expected(i + 1) = ((rgb >> 8) & 0xff).toByte
          expected(i + 2) = (rgb & 0xff).toByte
          i += 3
        }
        assert(f.pixels.sameElements(expected),
          s"pixel mismatch media $id frame ${f.frame_idx}")
      }
      reader.dispose(); ios.close()
      // frames differ across the animation (it is a real sequence, not a
      // repeated still): frame 0 and frame 2 decode to different rasters
      if (got.length > 1) assert(!got(0).pixels.sameElements(got(1).pixels))
    }
    // junk payload surfaces as an undecodable ROW, not an exception
    val sess = spark
    import sess.implicits._
    val junk = sess.createDataset(Seq(Multimodal.MediaItem(99L,
      Multimodal.MediaMeta("video", 0, 0, 0, 0L),
      Array.tabulate[Byte](64)(_.toByte))))
    val bad = Multimodal.decodeFrames(junk, 1).collect()
    assert(bad.length == 1 && bad.head.format == "undecodable")
  }

  test("REAL WAV/AIFF decode: distributed decodeAudio is sample-exact vs the generator's PCM") {
    val n = 15 // mixes rates (8k/16k/44.1k), 1-2 channels, WAV + AIFF
    val decoded = Multimodal.decodeAudio(Multimodal.audioMediaTable(spark, n))
      .collect().map(d => d.media_id -> d).toMap
    assert(decoded.size == n)
    (0 until n).foreach { id =>
      val d = decoded(id.toLong)
      val rate = Seq(8000, 16000, 44100)(id % 3)
      val channels = 1 + id % 2
      val frames = 64 + (id % 7) * 37
      assert(d.format == "pcm16", s"media $id not decoded")
      assert(d.sample_rate == rate && d.channels == channels
        && d.n_frames == frames)
      // PCM in a WAV/AIFF container is lossless: the decoded interleaved
      // samples must EQUAL the ground-truth signal the container encoded
      val truth = Multimodal.patternSamples(id, frames, channels).map(_.toInt)
      assert(d.samples.sameElements(truth), s"sample mismatch for media $id")
    }
  }

  test("FFT kernel matches a naive DFT") {
    val n = 16
    val rnd = new scala.util.Random(7)
    val re0 = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = re0.clone(); val im = new Array[Double](n)
    Multimodal.Fft.fft(re, im)
    (0 until n).foreach { k =>
      var dr = 0.0; var di = 0.0
      (0 until n).foreach { t =>
        val a = -2.0 * math.Pi * k * t / n
        dr += re0(t) * math.cos(a); di += re0(t) * math.sin(a)
      }
      assert(math.abs(re(k) - dr) < 1e-9 && math.abs(im(k) - di) < 1e-9,
        s"bin $k: (${re(k)},${im(k)}) vs naive ($dr,$di)")
    }
  }

  test("REAL audio featurize: a bin-aligned WAV test tone lands on its " +
      "exact frequency, mono and stereo alike; junk passes through") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val sess = spark
    import sess.implicits._
    val (rate, win, hz, amp, frames) = (8000, 256, 1000.0, 8000.0, 1024)
    def toneWav(channels: Int): Array[Byte] = {
      val bytes = new Array[Byte](frames * channels * 2)
      (0 until frames).foreach { i =>
        val s = math.round(amp * math.sin(2 * math.Pi * hz * i / rate)).toInt
        (0 until channels).foreach { c =>
          val off = (i * channels + c) * 2
          bytes(off) = (s & 0xff).toByte
          bytes(off + 1) = ((s >> 8) & 0xff).toByte
        }
      }
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val items = spark.createDataset(Seq(
      Multimodal.MediaItem(1L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        toneWav(1)),
      Multimodal.MediaItem(2L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        toneWav(2)), // same tone on both channels — the mix must not shift it
      Multimodal.MediaItem(3L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        "not audio at all".getBytes("UTF-8"))))
    val feats = Multimodal.spectralFeatures(
      Multimodal.decodeAudio(items), win).collect()
    val tone = feats.filter(_.media_id <= 2)
    assert(tone.length == 2 * frames / win)
    tone.foreach { f =>
      // 1000 Hz at 8 kHz in a 256 window is EXACTLY bin 32 — the dominant
      // pick must return it without tolerance
      assert(f.dominant_hz == 1000.0, s"window ${f.window_idx}: ${f.dominant_hz}")
      // quantization leaks a little power off-bin; centroid stays close
      assert(math.abs(f.centroid_hz - 1000.0) < 25.0, s"centroid ${f.centroid_hz}")
      // RMS of a sine is amp/sqrt(2)
      assert(math.abs(f.rms - amp / math.sqrt(2)) / (amp / math.sqrt(2)) < 0.02,
        s"rms ${f.rms}")
    }
    val junk = feats.filter(_.media_id == 3)
    assert(junk.length == 1 && junk.head.window_idx == -1)
  }

  test("log-mel filterbank: tones land in the right mel band, energies " +
      "equal a naive direct computation, stereo mix doesn't shift, junk " +
      "passes through") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val (rate, win, nMels, frames) = (8000, 256, 20, 512)
    def toneWav(hz: Double, channels: Int): Array[Byte] = {
      val bytes = new Array[Byte](frames * channels * 2)
      (0 until frames).foreach { i =>
        val s = math.round(8000.0 * math.sin(2 * math.Pi * hz * i / rate)).toInt
        (0 until channels).foreach { c =>
          val off = (i * channels + c) * 2
          bytes(off) = (s & 0xff).toByte
          bytes(off + 1) = ((s >> 8) & 0xff).toByte
        }
      }
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val items = spark.createDataset(Seq(
      Multimodal.MediaItem(1L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        toneWav(250.0, 1)),
      Multimodal.MediaItem(2L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        toneWav(1000.0, 1)),
      Multimodal.MediaItem(3L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        toneWav(3000.0, 1)),
      Multimodal.MediaItem(4L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        toneWav(1000.0, 2)), // stereo, same tone both channels
      Multimodal.MediaItem(5L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        "junk".getBytes("UTF-8"))))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaItem])
    val decoded = Multimodal.decodeAudio(items)
    val feats = Multimodal.melFeatures(decoded, win, nMels).collect()

    // mel-band geometry recomputed independently in the test
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def melInv(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    val edges = (0 to nMels + 1).map(i =>
      melInv(mel(rate / 2.0) * i / (nMels + 1)))
    def bandOf(hz: Double): Int = // band with max triangle height at hz
      (0 until nMels).maxBy { m =>
        val (fl, fc, fr) = (edges(m), edges(m + 1), edges(m + 2))
        if (hz <= fl || hz >= fr) 0.0
        else if (hz <= fc) (hz - fl) / (fc - fl)
        else (fr - hz) / (fr - fc)
      }
    for ((id, hz) <- Seq(1L -> 250.0, 2L -> 1000.0, 3L -> 3000.0)) {
      val rows = feats.filter(_.media_id == id)
      assert(rows.length == frames / win)
      rows.foreach { r =>
        assert(r.logmel.size == nMels)
        val got = r.logmel.zipWithIndex.maxBy(_._1)._2
        assert(got == bandOf(hz),
          s"media $id tone $hz Hz: argmax band $got != ${bandOf(hz)}")
      }
    }
    // stereo same-tone mix equals the mono result exactly
    val mono = feats.filter(_.media_id == 2L).sortBy(_.window_idx)
    val stereo = feats.filter(_.media_id == 4L).sortBy(_.window_idx)
    mono.zip(stereo).foreach { case (a, b) =>
      a.logmel.zip(b.logmel).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, "stereo mix shifted the bands") }
    }
    // naive direct cross-check on one window of the 1 kHz tone: DFT
    // power + the same triangle formula, written independently
    val d2 = decoded.collect().find(_.media_id == 2L).get
    val sig = d2.samples.take(win).map(_.toDouble)
    val half = win / 2
    val power = (1 to half).map { k =>
      var dr = 0.0; var di = 0.0
      (0 until win).foreach { t =>
        val a = -2.0 * math.Pi * k * t / win
        dr += sig(t) * math.cos(a); di += sig(t) * math.sin(a)
      }
      dr * dr + di * di
    }
    val expect = (0 until nMels).map { m =>
      val (fl, fc, fr) = (edges(m), edges(m + 1), edges(m + 2))
      var e = 0.0
      (1 to half).foreach { k =>
        val fk = k.toDouble * rate / win
        val w =
          if (fk <= fl || fk >= fr) 0.0
          else if (fk <= fc) (fk - fl) / (fc - fl)
          else (fr - fk) / (fr - fc)
        e += w * power(k - 1)
      }
      math.log(math.max(e, 1e-10))
    }
    val got0 = feats.filter(_.media_id == 2L).minBy(_.window_idx).logmel
    got0.zip(expect).zipWithIndex.foreach { case ((g, e), m) =>
      assert(math.abs(g - e) < 1e-6 * math.max(1.0, math.abs(e)),
        s"band $m: $g vs naive $e")
    }
    // junk passes through as the -1 marker with no bands
    val junk = feats.filter(_.media_id == 5L)
    assert(junk.length == 1 && junk.head.window_idx == -1
      && junk.head.logmel.isEmpty)
  }

  test("perceptual dHash: resize-stable, discriminative, banded near-dup " +
      "decisions complete vs brute force") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions._
    // smooth low-frequency patterns: the 9x8 dHash grid sees shapes, so
    // the SAME pattern at different resolutions must hash nearby while
    // different patterns land far apart
    def smoothPng(pat: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val fx = x.toDouble / w; val fy = y.toDouble / h
          val r = ((math.sin(2 * math.Pi * (fx * (1 + pat % 3) + pat * 0.37)) + 1) * 127).toInt
          val g = ((math.sin(2 * math.Pi * (fy * (1 + pat % 4) + pat * 0.11)) + 1) * 127).toInt
          val b = ((math.cos(2 * math.Pi * (fx * fy + pat * 0.23)) + 1) * 127).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        }
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def item(id: Long, payload: Array[Byte]) =
      Multimodal.MediaItem(id, Multimodal.MediaMeta("image", 0, 0, 0, 0L), payload)
    val pats = 0L until 5L
    val base = pats.map(p => item(p, smoothPng(p, 64, 64)))
    val twins = pats.take(2).map(p => item(100 + p, smoothPng(p, 96, 96)))
    val exact = Seq(item(200, smoothPng(3, 64, 64))) // byte-identical to id 3
    val junk = Seq(item(300, "not an image".getBytes("UTF-8")))
    val items = spark.createDataset(base ++ twins ++ exact ++ junk)
    val hashes = Multimodal.imageDhash(items)
    val hs = hashes.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hs(300L).isEmpty, "junk must hash to null")
    assert(hs(200L) == hs(3L), "byte-identical payloads must hash equal")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hs(a).get ^ hs(b).get)
    pats.take(2).foreach { p =>
      assert(ham(p, 100 + p) <= 7, s"pattern $p resize moved ${ham(p, 100 + p)} bits")
    }
    for (a <- pats; b <- pats if a < b)
      assert(ham(a, b) > 7, s"patterns $a,$b too close: ${ham(a, b)}")
    // decisions: twins + the exact copy collapse to their base ids
    val dec = Multimodal.imageNearDups(hashes).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(dec(100L) == (0L, true) && dec(101L) == (1L, true))
    assert(dec(200L) == (3L, true))
    pats.foreach(p => assert(dec(p) == (p, false), s"base $p must keep itself"))
    assert(!dec.contains(300L), "undecodable rows carry no decision")
    // completeness: banded candidate pairs == brute-force Hamming<=7 pairs
    val ids = hs.collect { case (id, Some(_)) => id }.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b && ham(a, b) <= 7
    } yield (a, b)).toSet
    val banded = dec.collect { case (id, (rep, true)) => (rep, id) }.toSet
    // every brute pair must be discoverable: its smaller member is the
    // rep of (or shares a rep chain with) the larger — check reachability
    brute.foreach { case (a, b) =>
      assert(dec(b)._2, s"brute pair ($a,$b) missed: $b not marked dup")
    }
    assert(banded.nonEmpty)
  }

  test("perceptual pHash: resize-stable, discriminative, brightness " +
      "offset moves at most the DC bit, banded decisions work") {
    val sess = spark
    import sess.implicits._
    def smoothPng(pat: Long, w: Int, h: Int, bright: Int = 0): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val fx = x.toDouble / w; val fy = y.toDouble / h
          def clamp(v: Int) = math.max(0, math.min(255, v + bright))
          val r = clamp(((math.sin(2 * math.Pi * (fx * (1 + pat % 3) + pat * 0.37)) + 1) * 100).toInt)
          val g = clamp(((math.sin(2 * math.Pi * (fy * (1 + pat % 4) + pat * 0.11)) + 1) * 100).toInt)
          val b = clamp(((math.cos(2 * math.Pi * (fx * fy + pat * 0.23)) + 1) * 100).toInt)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        }
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def item(id: Long, payload: Array[Byte]) =
      Multimodal.MediaItem(id, Multimodal.MediaMeta("image", 0, 0, 0, 0L), payload)
    val pats = 0L until 5L
    val items = spark.createDataset(
      pats.map(p => item(p, smoothPng(p, 64, 64))) ++
        pats.take(2).map(p => item(100 + p, smoothPng(p, 96, 96))) ++
        Seq(item(200, smoothPng(3, 64, 64))) ++          // byte-identical
        Seq(item(210, smoothPng(2, 64, 64, bright = 25))) ++ // brighter twin
        Seq(item(300, "not an image".getBytes("UTF-8"))))
    val hs = Multimodal.imagePhash(items).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hs(300L).isEmpty, "junk must hash to null")
    assert(hs(200L) == hs(3L), "byte-identical payloads must hash equal")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hs(a).get ^ hs(b).get)
    pats.take(2).foreach { p =>
      assert(ham(p, 100 + p) <= 7, s"pattern $p resize moved ${ham(p, 100 + p)} bits")
    }
    for (a <- pats; b <- pats if a < b)
      assert(ham(a, b) > 7, s"patterns $a,$b too close: ${ham(a, b)}")
    // a uniform brightness offset only moves the DC coefficient; the AC
    // median and AC bits stay — pHash's structural-invariance property
    // (clamping at 255 can leak a little; allow the DC bit + 2)
    assert(ham(2L, 210L) <= 3, s"brightness moved ${ham(2L, 210L)} bits")
    // the gate query runs end to end with planted twins collapsing
    val dec = Multimodal.qMediaPhashdup(spark, "").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(dec(100000L)._2 && dec(100001L)._2, "planted twins must match")
    assert(dec.nonEmpty)
  }

  test("MFCC: coefficients equal a naive DCT-II of the log-mel vector, " +
      "c0 tracks energy, undecodable rows pass through") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val (rate, win, nMels, frames) = (8000, 256, 20, 512)
    def toneWav(hz: Double, amp: Double): Array[Byte] = {
      val bytes = new Array[Byte](frames * 2)
      (0 until frames).foreach { i =>
        val s = math.round(amp * math.sin(2 * math.Pi * hz * i / rate)).toInt
        bytes(i * 2) = (s & 0xff).toByte
        bytes(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val items = spark.createDataset(Seq(
      Multimodal.MediaItem(1L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        toneWav(1000.0, 8000.0)),
      Multimodal.MediaItem(2L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        toneWav(1000.0, 800.0)), // same tone, 20 dB quieter
      Multimodal.MediaItem(3L, Multimodal.MediaMeta("audio", 0, 0, rate, 0),
        "junk".getBytes("UTF-8"))))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaItem])
    val mel = Multimodal.melFeatures(Multimodal.decodeAudio(items), win, nMels)
    val mels = mel.collect().map(m => (m.media_id, m.window_idx) -> m.logmel).toMap
    val got = Multimodal.mfccFeatures(mel, 13).collect()
      .map(m => (m.media_id, m.window_idx) -> m.mfcc).toMap
    // undecodable marker passes through empty
    assert(got((3L, -1)).isEmpty)
    // bin-exact naive reference
    got.foreach { case ((id, w), cs) =>
      if (w >= 0) {
        val v = mels((id, w))
        val n = v.length
        assert(cs.length == 13)
        cs.zipWithIndex.foreach { case (c, i) =>
          val scale = if (i == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
          // scale folds into each basis element BEFORE the product, the
          // operator's evaluation order — bit-equality, not tolerance
          val want = v.zipWithIndex.map { case (x, j) =>
            (scale * math.cos(math.Pi * i * (j + 0.5) / n)) * x }.sum
          assert(c == want, s"($id,$w) c$i: $c vs $want")
        }
      }
    }
    // c0 = sqrt(1/N)*sum(logmel) is monotone in energy: the quieter tone
    // scores a smaller c0 in every window
    val w0 = got.keys.collect { case (1L, w) if w >= 0 => w }
    w0.foreach { w => assert(got((1L, w))(0) > got((2L, w))(0)) }
  }

  test("activity detection: silence/tone/noise windows classify by " +
      "energy + spectral flatness; adjacent classes merge into segments; " +
      "undecodables pass through") {
    val sess = spark
    import sess.implicits._
    val win = 256
    // planted mono signal: 4 windows silence, 4 windows of a bin-aligned
    // tone (8 cycles per window — phase-continuous), 2 windows of
    // splitmix broadband noise (loud but unstructured), 1 window silence
    val samples = new Array[Int](11 * win)
    (4 * win until 8 * win).foreach { i =>
      samples(i) = math.round(10000.0 *
        math.sin(2 * math.Pi * 8 * i / win)).toInt
    }
    (8 * win until 10 * win).foreach { i =>
      var z = 7L * 1000003L + i.toLong * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      samples(i) = ((z >>> 37) % 20001 - 10000).toInt
    }
    val audio = Seq(
      Multimodal.DecodedAudio(1L, "wav", 8000, 1, samples.length.toLong,
        samples),
      Multimodal.DecodedAudio(2L, "undecodable", 0, 0, 0L,
        Array.empty[Int])).toDS()
    val ws = Multimodal.activityWindows(audio, win, rmsFloor = 100.0,
        flatMax = 0.2)
      .collect().filter(_.media_id == 1L).sortBy(_.window_idx)
    assert(ws.length == 11)
    // measured physics: tone windows are structured, noise windows are not
    (4 to 7).foreach(i => assert(ws(i).flatness < 0.1 && ws(i).rms > 1000,
      s"tone window $i: ${ws(i)}"))
    (8 to 9).foreach(i => assert(ws(i).flatness > 0.3 && ws(i).rms > 1000,
      s"noise window $i: ${ws(i)}"))
    (0 to 3).foreach(i => assert(ws(i).rms < 1e-9, s"silence window $i"))
    assert(ws.map(_.active).toSeq ==
      Seq(false, false, false, false, true, true, true, true, false,
        false, false))
    // segments: silence+noise are both inactive → 3 runs
    val segs = Multimodal.activitySegments(audio, win, rmsFloor = 100.0,
        flatMax = 0.2)
      .collect().filter(_.media_id == 1L).sortBy(_.seg_idx)
    assert(segs.map(s => (s.start_window, s.n_windows, s.active)).toSeq ==
      Seq((0, 4, false), (4, 4, true), (8, 3, false)), segs.toSeq)
    // undecodable → marker rows in both shapes
    assert(Multimodal.activityWindows(audio, win).collect()
      .filter(_.media_id == 2L).map(_.window_idx).toSeq == Seq(-1))
    assert(Multimodal.activitySegments(audio, win).collect()
      .filter(_.media_id == 2L).map(_.seg_idx).toSeq == Seq(-1))
  }

  test("undecodable audio payloads surface as data, not exceptions") {
    // text bytes and PNG bytes are both not parseable audio containers
    val text = Multimodal.mediaTable(spark, sf).limit(10)
    val outText = Multimodal.decodeAudio(text).collect()
    assert(outText.length == 10)
    assert(outText.forall(d => d.format == "undecodable" && d.samples.isEmpty))
    val png = Multimodal.pngMediaTable(spark, 5)
    val outPng = Multimodal.decodeAudio(png).collect()
    assert(outPng.forall(_.format == "undecodable"))
  }

  test("undecodable payloads surface as data, not exceptions") {
    val media = Multimodal.mediaTable(spark, sf) // payloads are text bytes
    val out = Multimodal.decodeImages(media.limit(20)).collect()
    assert(out.length == 20)
    assert(out.forall(d => d.format == "undecodable" && d.pixels.isEmpty))
  }

  test("header-only probe reports dims/format/frames without pixel decode") {
    // stills: dims equal the generator's, format png, one image
    val png = Multimodal.probeImages(Multimodal.pngMediaTable(spark, 12))
      .collect().map(p => p.media_id -> p).toMap
    (0 until 12).foreach { i =>
      val p = png(i.toLong)
      val (w, h) = (16 + (i % 5) * 8, 16 + (i % 3) * 8)
      assert(p.format == "png" && p.n_images == 1
        && p.width == w && p.height == h, s"probe $i: $p")
    }
    // animations: frame count equals the generator's sequence length
    val gif = Multimodal.probeImages(Multimodal.gifMediaTable(spark, 8))
      .collect().map(p => p.media_id -> p).toMap
    (0 until 8).foreach { i =>
      val p = gif(i.toLong)
      assert(p.format == "gif" && p.n_images == 3 + (i % 4), s"probe $i: $p")
    }
    // junk payloads are data, never exceptions
    val junk = Multimodal.probeImages(
      Multimodal.mediaTable(spark, sf).limit(10)).collect()
    assert(junk.length == 10)
    assert(junk.forall(_.format == "undecodable"))
  }

  test("metadata predicate filters without touching payloads") {
    val imgs = Multimodal.selectKind(Multimodal.mediaTable(spark, sf), "image")
    assert(imgs.count() > 0)
    assert(imgs.collect().forall(_.meta.kind == "image"))
    val stats = Multimodal.featureStats(
      Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))).collect()
    assert(stats.length == 3)
    assert(stats.map(_.getAs[Long]("n_items")).sum == Tables.documents(spark, sf).count())
  }
}

/** The injected fake container format + codec for the boundary test —
  * top-level (serializable, no suite reference) so the codec ships to
  * executors like a real external codec would. */
object MultimodalSpec {

  private val Magic = "FAKE".getBytes("US-ASCII")

  private def frameByte(id: Long, f: Int, i: Int): Byte =
    ((id * 31 + f * 17 + i * 7) % 256).toByte

  /** magic + w + h + nFrames + nFrames full frames of w*h*3 bytes. */
  def fakeContainer(id: Long): Array[Byte] = {
    val (w, h) = (4 + (id % 3).toInt, 3 + (id % 2).toInt)
    val nFrames = 3 + (id % 4).toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic); out.write(w); out.write(h); out.write(nFrames)
    (0 until nFrames).foreach { f =>
      val px = Array.tabulate(w * h * 3)(i => frameByte(id, f, i))
      out.write(px)
    }
    out.toByteArray
  }

  /** Shared parse — the codec's decoder and the driver-side reference both
    * read the same bytes through it. */
  private def parseFake(payload: Array[Byte], everyNth: Int)
      : Option[Seq[Multimodal.CodecFrame]] = {
    if (payload.length < 7 || !payload.take(4).sameElements(Magic)) return None
    val (w, h, n) = (payload(4).toInt, payload(5).toInt, payload(6).toInt)
    val frameLen = w * h * 3
    if (payload.length != 7 + n * frameLen) return None
    Some((0 until n by everyNth).map { f =>
      Multimodal.CodecFrame(f, w, h, "rgb24",
        java.util.Arrays.copyOfRange(payload, 7 + f * frameLen,
          7 + (f + 1) * frameLen))
    })
  }

  /** Driver-side reference decode of the container bytes for `id`. */
  def referenceFrames(id: Long, everyNth: Int): Seq[(Int, Int, Int, Array[Byte])] =
    parseFake(fakeContainer(id), everyNth).get
      .map(f => (f.frame_idx, f.width, f.height, f.pixels))

  /** The injected codec: counts open() calls via an accumulator so the
    * spec can assert per-PARTITION (not per-row) initialization. */
  final case class FakeCodec(opens: org.apache.spark.util.LongAccumulator)
      extends Multimodal.VideoCodec {
    def name = "fake-container"
    def open(): Multimodal.VideoDecoder = {
      opens.add(1)
      new Multimodal.VideoDecoder {
        def decode(payload: Array[Byte], everyNth: Int) =
          parseFake(payload, everyNth)
      }
    }
  }
}
