package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Space-Saving heavy hitters: the published guarantees
  * (coverage of every item with true frequency > n/k; per-item bounds
  * est − err ≤ true ≤ est) checked against exact batch counts, plus
  * micro-batch-split determinism for a fixed arrival order. */
class HeavyHitterSpec extends GraftSpec {

  private val K = 8

  // fixed skewed workload: two heavy items, one mid, a singleton tail;
  // deterministically interleaved (seeded shuffle)
  private def workload(tag: String): Seq[(String, Long)] = {
    val items = Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(12)(3L) ++
      (100L until 140L)
    val rnd = new scala.util.Random(42)
    rnd.shuffle(items).map(i => (tag, i))
  }

  private def run(batches: Seq[Seq[(String, Long)]], name: String)
      : Map[(String, Long), (Long, Long, Long, Boolean)] = {
    val sess = spark; import sess.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Streams.heavyHittersMonitor(spark,
        mem.toDF().toDF("event_type", "user_id"), k = K)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val rows = spark.table(name).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
          r.getAs[Long]("item"), r.getAs[Long]("est"), r.getAs[Long]("err"),
          r.getAs[Boolean]("guaranteed")))
      // final state = the report rows at each key's max n_events
      rows.groupBy(_._1).toSeq.flatMap { case (et, rs) =>
        val nMax = rs.map(_._2).max
        rs.filter(_._2 == nMax).toSeq.map(r =>
          (et, r._3) -> (r._2, r._4, r._5, r._6))
      }.toMap
    } finally q.stop()
  }

  test("coverage + bounds vs exact counts; guaranteed flags are sound; " +
      "split feeding reproduces the one-shot summary") {
    val a = workload("alpha"); val b = workload("beta")
    val all = a.zip(b).flatMap { case (x, y) => Seq(x, y) } // interleave keys
    val exact: Map[(String, Long), Long] =
      all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = a.size.toLong
    val one = run(Seq(all), s"hh_one_${System.nanoTime()}")
    Seq("alpha", "beta").foreach { et =>
      val reported = one.collect { case ((e, i), v) if e == et => i -> v }
      // every item with true freq > n/k must be reported (items 1 and 2:
      // 40 and 25 > 117/8)
      exact.collect { case ((e, i), c) if e == et && c * K > n => i }
        .foreach(i => assert(reported.contains(i),
          s"$et: heavy item $i missing from ${reported.keys}"))
      // per-item bounds est - err <= true <= est
      reported.foreach { case (i, (nn, est, err, g)) =>
        assert(nn == n)
        val t = exact.getOrElse((et, i), 0L)
        assert(est - err <= t && t <= est, s"$et item $i: [$est,$err] vs $t")
        // a guaranteed flag must imply TRUE frequency > n/k
        if (g) assert(t * K > n, s"$et item $i flagged but true=$t")
      }
      // the two genuinely heavy items must come out guaranteed
      assert(reported(1L)._4 && reported(2L)._4, s"$et: $reported")
    }
    // identical arrival order under a different micro-batch split →
    // identical final summary (state folds sequentially per key)
    val split = run(Seq(all.take(50), all.slice(50, 151), all.drop(151)),
      s"hh_split_${System.nanoTime()}")
    assert(split == one, "micro-batch split changed the summary")
  }
}
