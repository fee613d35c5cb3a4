package graft

/** Per-query PHASE timing for the bench: fixture-heavy entries (the lake
  * lifecycle queries build a temp lake + write waves around a
  * blast-radius-bound operator) wrap their construction in
  * `BenchPhase("fixture"){...}` and the measured operation in
  * `BenchPhase("op"){...}`, so the bench artifact carries both and the
  * 2x regression gate can guard the OPERATOR, not temp-dir I/O (the
  * fixture cost rides cold-file-cache drift of 2-4x between same-HEAD
  * runs — see CLAUDE.md's q_lake_merge note). No-op cost when the bench
  * isn't draining: a thread-local map insert per phase. Phases nest by
  * summing (re-entry adds). */
object BenchPhase {
  private val tl =
    new ThreadLocal[scala.collection.mutable.LinkedHashMap[String, Double]] {
      override def initialValue() =
        scala.collection.mutable.LinkedHashMap.empty[String, Double]
    }

  def apply[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val m = tl.get
      m(name) = m.getOrElse(name, 0.0) + (System.nanoTime() - t0) / 1e9
    }
  }

  /** Phases recorded on this thread since the last drain (cleared). */
  def drain(): Seq[(String, Double)] = {
    val m = tl.get
    val r = m.toSeq
    m.clear()
    r
  }
}
