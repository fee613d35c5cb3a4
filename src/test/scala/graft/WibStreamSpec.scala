package graft

import graft.functions.WibFrame
import graft.streaming.Streams
import graft.tools.WibGen
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming WIB pedestal monitor: frames arriving over a stream produce
  * the same exact per-channel totals as the batch decode over everything
  * landed — including across multiple micro-batches (the accumulation is
  * incremental partial aggregation of exact BIGINT sums). */
case class RawFrame(frame_id: Long, payload: Array[Byte])

class WibStreamSpec extends GraftSpec {

  test("streamed per-channel totals equal the batch decode over all landed frames") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val frames = for (s <- 0 until 4; f <- 0 until 10)
      yield RawFrame(s * 10L + f, WibGen.payload(s, f))
    val (first, second) = frames.splitAt(15)

    val mem = MemoryStream[RawFrame]
    val query = Streams.wibMonitor(mem.toDF()).writeStream
      .format("memory").queryName("wib_monitor_out")
      .outputMode("complete").start()
    try {
      mem.addData(first)
      query.processAllAvailable()
      // first 15 frames span streams 0-1 → 2×Channels channels so far
      val mid = spark.table("wib_monitor_out").collect()
      assert(mid.length == 2 * WibFrame.Channels)
      // second micro-batch: totals must incrementally extend, not reset
      mem.addData(second)
      query.processAllAvailable()
      val streamed = spark.table("wib_monitor_out").collect()
        .map(r => r.getAs[Long]("channel") ->
          (r.getAs[Long]("n_samples"), r.getAs[Long]("sum_s"),
            r.getAs[Long]("sum_sq"), r.getAs[Long]("peak_adc"))).toMap

      val batch = Streams.wibMonitor(frames.toDF()).collect()
        .map(r => r.getAs[Long]("channel") ->
          (r.getAs[Long]("n_samples"), r.getAs[Long]("sum_s"),
            r.getAs[Long]("sum_sq"), r.getAs[Long]("peak_adc"))).toMap
      assert(streamed == batch,
        "streamed totals must equal the batch decode over all landed frames")
      assert(streamed.values.forall(_._1 == 10L * WibFrame.TicksPerChannel))
    } finally query.stop()
  }

  test("streamed hit totals equal the batch hit finder over the committed " +
      "fixture, across micro-batch splits; zero-hit channels report zero") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val frames = graft.operators.Wib.frames(spark).collect()
      .zipWithIndex
      .map { case (r, i) => RawFrame(i.toLong, r.getAs[Array[Byte]]("payload")) }
      .toSeq
    val (first, second) = frames.splitAt(frames.size / 3)
    val mem = MemoryStream[RawFrame]
    val query = Streams.wibHitMonitor(mem.toDF()).writeStream
      .format("memory").queryName("wib_hits_out")
      .outputMode("complete").start()
    try {
      mem.addData(first)
      query.processAllAvailable()
      mem.addData(second)
      query.processAllAvailable()
      val streamed = spark.table("wib_hits_out").collect()
        .map(r => r.getAs[Long]("channel") ->
          ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_hit_ticks"),
            r.getAs[Long]("charge_scaled"), r.getAs[Long]("peak_adc"))))
        .toMap
      val batch = graft.operators.Wib.qWibHits(spark, sf).collect()
        .map(r => r.getAs[Long]("channel") ->
          ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_hit_ticks"),
            r.getAs[Long]("charge_scaled"), r.getAs[Long]("peak_adc"))))
        .toMap
      // every batch hit channel matches exactly; monitor-only channels
      // are the zero-hit ones (the batch query emits hits-only rows)
      batch.foreach { case (ch, v) =>
        assert(streamed.get(ch).contains(v), s"channel $ch: " +
          s"streamed ${streamed.get(ch)} vs batch $v")
      }
      streamed.filterNot { case (ch, _) => batch.contains(ch) }
        .foreach { case (ch, (nh, nt, chg, _)) =>
          assert(nh == 0L && nt == 0L && chg == 0L,
            s"monitor-only channel $ch must be hitless")
        }
      assert(batch.nonEmpty, "fixture must contain planted pulses")
    } finally query.stop()
  }
}
