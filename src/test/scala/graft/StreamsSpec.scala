package graft

import graft.operators.Events
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends GraftSpec {

  import org.apache.spark.sql.{Encoder, Encoders}

  case class RawEvt(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  /** sf0.001 events as driver-side rows (1000 rows), event-time ordered. */
  private lazy val rawEvents: Seq[RawEvt] = {
    Events.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => RawEvt(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(_.ts.getTime)
  }

  test("streaming tumbling agg over a memory stream matches the batch analog") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[RawEvt]
    val out = Streams.tumblingAgg(mem.toDF())
    val query = out.writeStream
      .format("memory").queryName("tumbling_out").outputMode("append").start()
    try {
      mem.addData(rawEvents)
      query.processAllAvailable()
      // advance the watermark far past the data so every window closes
      val last = rawEvents.last
      mem.addData(Seq(last.copy(event_id = -1L,
        ts = new Timestamp(last.ts.getTime + 24L * 3600 * 1000))))
      query.processAllAvailable()

      val streamed = spark.table("tumbling_out")
        .filter(col("hour_start") <= lit(last.ts))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val batch = Events.qEvtTumbling(spark, sf).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(streamed == batch,
        s"streamed ${streamed.size} windows vs batch ${batch.size}")
    } finally query.stop()
  }

  test("stream dedup suppresses re-delivered event_ids") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[RawEvt]
    val query = Streams.dedupStream(mem.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val batch = rawEvents.take(100)
      mem.addData(batch)
      query.processAllAvailable()
      mem.addData(batch.take(50)) // duplicate re-delivery
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 100)
    } finally query.stop()
  }

  test("stateful sessionization emits gap-closed sessions consistent with batch") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[RawEvt]
    val out = Streams.sessionize(spark, mem.toDF())
    val query = out.writeStream
      .format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      mem.addData(rawEvents)
      query.processAllAvailable()
      val last = rawEvents.last
      mem.addData(Seq(last.copy(event_id = -1L, user_id = -999L,
        ts = new Timestamp(last.ts.getTime + 48L * 3600 * 1000))))
      query.processAllAvailable()

      val streamed = spark.table("sessions_out")
        .filter(col("user_id") =!= -999L)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getInt(3)))
        .toSet
      val batch = Events.qEvtSessionize(spark, sf).collect()
        .map(r => (r.getLong(0), r.getTimestamp(3).getTime, r.getLong(2).toInt))
        .toSet
      // every batch session should be emitted by the stream version
      val missing = batch -- streamed
      assert(missing.isEmpty,
        s"stream missed ${missing.size} of ${batch.size} sessions, e.g. ${missing.take(3)}")
    } finally query.stop()
  }
}
