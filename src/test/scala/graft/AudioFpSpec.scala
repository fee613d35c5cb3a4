package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaItem, MediaMeta}
import org.apache.spark.sql.functions._

/** Audio fingerprinting (constellation hashing): landmark pairs are
  * time-offset invariant, the offset-histogram vote aligns true content
  * matches at their real delay, different content stays unmatched, and
  * the stop-hash cap drops degenerate landmarks before the join. */
class AudioFpSpec extends GraftSpec {

  private val W = 256

  private def item(id: Long, nWin: Int, delay: Int = 0): MediaItem =
    MediaItem(id, MediaMeta("audio", 0, 0, 16000, nWin.toLong * W / 16),
      Multimodal.melodyWavBytes(id % 100, nWin, W, delay))

  test("same melody embedded at a delay matches with the TRUE window " +
      "offset; different melodies do not match") {
    val sess = spark
    import sess.implicits._
    // ids 1/101 share melody 1 (101 delayed by 5 windows of silence);
    // id 2 is a different melody
    val items = Seq(item(1L, 24), item(101L, 29, delay = 5), item(2L, 24))
    val fps = Multimodal.audioFingerprints(
      Multimodal.decodeAudio(sess.createDataset(items)), windowSize = W)
    val m = Multimodal.audioMatches(fps, minVotes = 5).collect()
    val pairs = m.map(r => ((r.getLong(0), r.getLong(1)),
      (r.getInt(2), r.getLong(3)))).toMap
    assert(pairs.contains((1L, 101L)),
      s"delayed twin must match; got ${pairs.keys.toSeq}")
    val (offset, votes) = pairs((1L, 101L))
    // id 1's window w == id 101's window w+5 -> t_a - t_b = -5
    assert(offset == -5, s"dominant offset $offset != -5")
    assert(votes >= 10, s"votes $votes too low for 24 aligned windows")
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 101L)),
      s"different melodies must not match: ${pairs.keys.toSeq}")
  }

  test("fingerprints are deterministic and time-offset invariant in the " +
      "hash (the (f1, f2, dt) triple carries no absolute time)") {
    val sess = spark
    import sess.implicits._
    val base = Multimodal.audioFingerprints(
      Multimodal.decodeAudio(sess.createDataset(Seq(item(7L, 16)))),
      windowSize = W)
      .collect().map(f => (f.hash, f.t)).sortBy(x => (x._2, x._1))
    val again = Multimodal.audioFingerprints(
      Multimodal.decodeAudio(sess.createDataset(Seq(item(7L, 16)))),
      windowSize = W)
      .collect().map(f => (f.hash, f.t)).sortBy(x => (x._2, x._1))
    assert(base.sameElements(again), "fingerprints must be deterministic")
    // the delayed twin's hash SET is a superset restricted to shifted t
    val delayed = Multimodal.audioFingerprints(
      Multimodal.decodeAudio(
        sess.createDataset(Seq(item(7L, 21, delay = 5)))), windowSize = W)
      .collect().map(f => (f.hash, f.t)).toSet
    val shifted = base.map { case (h, t) => (h, t + 5) }.toSet
    val missing = shifted -- delayed
    assert(missing.size <= shifted.size / 10,
      s"delayed clip lost ${missing.size}/${shifted.size} landmarks")
  }

  test("stop-hash cap: a landmark present in more items than the cap is " +
      "dropped before the join (no quadratic storm, no spurious match)") {
    val sess = spark
    import sess.implicits._
    // 6 items all sharing melody 50 -> every landmark is in 6 items;
    // cap 5 drops them all -> zero matches despite identical content
    val items = (0 until 6).map(i => item(1000L + i, 12).copy(
      payload = Multimodal.melodyWavBytes(50, 12, W)))
    val fps = Multimodal.audioFingerprints(
      Multimodal.decodeAudio(sess.createDataset(items)), windowSize = W)
    val m = Multimodal.audioMatches(fps, minVotes = 1, maxItemsPerHash = 5)
    assert(m.count() == 0, "capped hashes must not produce matches")
    // raising the cap restores the matches
    val m2 = Multimodal.audioMatches(fps, minVotes = 5, maxItemsPerHash = 6)
    assert(m2.count() == 15, "all 15 pairs of the 6 identical clips match")
  }
}
