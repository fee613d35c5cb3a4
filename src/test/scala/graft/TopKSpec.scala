package graft

import graft.operators.{Relational, Relational2, TopK, Events}
import org.apache.spark.sql.functions._

class TopKSpec extends GraftSpec {

  test("bounded-heap top-k equals the window-function formulation") {
    val heap = TopK.qTopkGroup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val window = Relational.qWindowRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(heap == window)
  }

  test("heap insert keeps the k best under permutation") {
    val agg = new TopK.TopKAgg(3)
    val entries = Seq(
      TopK.Entry(5.0, 1), TopK.Entry(9.0, 2), TopK.Entry(9.0, 3),
      TopK.Entry(1.0, 4), TopK.Entry(7.0, 5), TopK.Entry(9.0, 6))
    val expected = Seq(TopK.Entry(9.0, 2), TopK.Entry(9.0, 3), TopK.Entry(9.0, 6))
    entries.permutations.take(100).foreach { perm =>
      val r = agg.finish(perm.foldLeft(agg.zero)(agg.reduce))
      assert(r == expected, s"perm $perm gave $r")
    }
    // and merge() over split buffers agrees
    val (a, b) = entries.splitAt(3)
    val merged = agg.finish(agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
    assert(merged == expected)
  }

  test("approx percentile lands within 2% of the exact percentile") {
    val approx = Relational2.qApproxPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Relational2.qPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) / ex < 0.02, s"$k: ${approx(k)} vs $ex")
    }
  }

  test("session_window agrees with the lag/running-sum sessionization") {
    val sw = Events.qEvtSessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    val lagForm = Events.qEvtSessionize(spark, sf)
      .select(col("user_id"), col("sess_start"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    assert(sw == lagForm)
  }
}
