package graft.tools

import graft.functions.WibFrame

/** Deterministic WIB-frame fixture generator: writes
  * `data/wib/frames.parquet` (frame_id, payload BINARY) — 12 streams × 50
  * frames in the layout `WibFrame` decodes. Samples are ADC-shaped: a
  * per-channel pedestal, LCG noise, and sparse large peaks (the signals
  * q_wib_pedestal's mean/RMS/peak stats summarize). Re-running reproduces
  * byte-identical files (fixed seed, no clock/rng). The fixture is committed;
  * this main exists to regenerate it if the layout ever changes.
  */
object WibGen {
  val Streams = 12
  val FramesPerStream = 50
  val TickStep = 2048L // ticks between frames of one stream (62.5 MHz clock)

  /** splitmix64 step — deterministic noise source. */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def payload(srcId: Int, frameIdx: Int): Array[Byte] = {
    val bytes = new Array[Byte](WibFrame.FrameBytes)
    val ts = 62_500_000_000L + frameIdx * TickStep
    var i = 0
    while (i < 4) { bytes(i) = ((srcId >>> (8 * i)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < 8) { bytes(4 + i) = ((ts >>> (8 * i)) & 0xff).toByte; i += 1 }
    var j = 0
    val n = WibFrame.Channels * WibFrame.TicksPerChannel
    while (j < n) {
      val ch = srcId * WibFrame.Channels + j % WibFrame.Channels
      val pedestal = 2250 + (13 * ch) % 101
      val r = mix(srcId * 1000003L + frameIdx * 257L + j)
      val noise = ((r >>> 33) % 51).toInt - 25
      // common-mode pickup: depends on (stream, frame, tick) only — the
      // same excursion hits all 4 channels of a tick (what q_wib_coherent
      // separates from the channel-local noise above)
      val rc = mix(srcId * 31337L + frameIdx * 65521L + j / WibFrame.Channels)
      val cm = ((rc >>> 33) % 41).toInt - 20
      val peak = if ((r & 0x3ffL) == 0L) 3000 else 0 // ~1/1024 ticks spike
      val v = pedestal + noise + cm + peak
      val off = WibFrame.HeaderBytes + 2 * j
      bytes(off) = (v & 0xff).toByte
      bytes(off + 1) = ((v >>> 8) & 0xff).toByte
      j += 1
    }
    bytes
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val rows = for {
      s <- 0 until Streams
      f <- 0 until FramesPerStream
    } yield (s.toLong * FramesPerStream + f, payload(s, f))
    // Write via a temp dir, then promote the single part file to a stable
    // single-file fixture path (no _SUCCESS/.crc noise in git).
    val tmp = "/tmp/wibgen_out"
    rows.toDF("frame_id", "payload")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File("data/wib/frames.parquet")
    dest.getParentFile.mkdirs()
    java.nio.file.Files.copy(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    spark.stop()
  }
}
