package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** Deterministic operational-log fixture generator: writes
  * `data/logs/daq.log` in the reference's log-line format
  * (cf. /root/reference/logging.sh:24:
  * `[iceberg-daq | LOG_PREFIX | YYYY-MM-DD HH:MM:SS] LEVEL: msg`),
  * including the ANSI color wrapping the real `_log` emits and a sprinkle
  * of non-conforming lines (bare stack traces, blanks) a real captured
  * stdout/stderr stream would contain. Re-running reproduces a
  * byte-identical file (fixed seed, no clock/rng). The fixture is
  * committed; this main exists to regenerate it if the shape changes.
  */
object LogGen {

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val Scripts = Vector(
    "configure_timing.sh" -> 0.02, // script -> error proneness
    "power_fembs.sh" -> 0.10,
    "start_run.sh" -> 0.04,
    "stop_run.sh" -> 0.01,
    "createMetadatafiles_iceberg_dropbox.sh" -> 0.07,
    "check_links.sh" -> 0.15)

  private val Msgs = Vector(
    "starting step", "step complete", "retrying after timeout",
    "checksum recorded", "link alignment ok", "buffer occupancy nominal",
    "FEMB current out of range", "timing endpoint not locked",
    "dropbox file moved", "run registered")

  private val Color = Map("INFO" -> "\u001b[38;5;36m",
    "WARNING" -> "\u001b[38;5;178m", "ERROR" -> "\u001b[38;5;203m")
  private val Reset = "\u001b[0m"
  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  def main(args: Array[String]): Unit = {
    val base = Instant.parse("2025-03-01T00:00:00Z").getEpochSecond
    val sb = new StringBuilder
    var t = base
    var i = 0L
    while (i < 6000) {
      val r0 = mix(i * 31L + 7)
      t += 5 + ((r0 >>> 17) % 113) // 5..117 s apart, ~8 days total
      val (script, errP) = Scripts(((r0 >>> 7) % Scripts.size).toInt)
      val u = ((mix(i * 101L + 3) >>> 11) % 1000) / 1000.0
      val level =
        if (u < errP) "ERROR"
        else if (u < errP * 3) "WARNING"
        else "INFO"
      val msg = Msgs(((r0 >>> 29) % Msgs.size).toInt)
      val line = s"[iceberg-daq | $script | ${Fmt.format(Instant.ofEpochSecond(t))}] $level: $msg"
      // the real _log colors every line; a captured stream keeps ~half
      val colored = (mix(i + 77) & 1) == 0
      sb.append(if (colored) s"${Color(level)}$line$Reset" else line)
      sb.append('\n')
      // non-conforming noise a real capture contains (~2% of lines)
      if ((mix(i + 991) % 50) == 0)
        sb.append("  at daq.fakestack.Frame.run(Frame.java:42)\n")
      if ((mix(i + 1733) % 97) == 0) sb.append('\n')
      i += 1
    }
    val out = Paths.get("data/logs/daq.log")
    Files.createDirectories(out.getParent)
    Files.write(out, sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${sb.length} chars)")
  }
}
