package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Deterministic PII-corpus fixture generator: writes
  * `data/pii/corpus.txt` as `doc_id|text` lines where the text is filler
  * prose with emails, phone numbers, and IPv4 addresses spliced in at
  * known (seeded) positions — the input shape of the PII-scrubbing pass
  * every training-data pipeline runs before anything else sees the text.
  * The three PII forms are mutually non-overlapping by construction
  * (emails carry no 4-dotted digit runs, phones are dash-separated) and
  * the filler vocabulary contains no `@`, digits, or dots, so every match
  * is intentional. Re-running reproduces a byte-identical file (fixed
  * seed, no clock/rng); the fixture is committed and this main exists to
  * regenerate it if the shape changes.
  */
object PiiGen {

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val Words = Vector("the", "run", "shift", "log", "was", "clean",
    "and", "nothing", "tripped", "over", "night", "contact", "oncall",
    "expert", "for", "details", "about", "link", "alignment", "buffer",
    "reported", "nominal", "occupancy", "during", "ramp")

  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    var doc = 0
    while (doc < 400) {
      sb.append(doc).append('|')
      val nTok = 20 + (mix(doc * 17L + 1) >>> 9) % 40
      var j = 0L
      while (j < nTok) {
        val r = mix(doc * 1009L + j * 31L + 5)
        // ~12% of slots carry a PII token; the rest are filler words
        ((r >>> 5) % 25) match {
          case 0 =>
            val u = (r >>> 13) % 90; val h = (r >>> 33) % 9
            sb.append(s"user$u@example$h.org")
          case 1 =>
            val a = (r >>> 13) % 900 + 100; val b = (r >>> 33) % 9000 + 1000
            sb.append(s"+1-555-$a-$b")
          case 2 =>
            val a = (r >>> 13) % 256; val b = (r >>> 23) % 256
            val c = (r >>> 33) % 256
            sb.append(s"10.$a.$b.$c")
          case k =>
            sb.append(Words((((r >>> 11) + k) % Words.size).toInt))
        }
        if (j < nTok - 1) sb.append(' ')
        j += 1
      }
      sb.append('\n')
      doc += 1
    }
    val out = Paths.get("data/pii/corpus.txt")
    Files.createDirectories(out.getParent)
    Files.write(out, sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${sb.length} chars)")
  }
}
