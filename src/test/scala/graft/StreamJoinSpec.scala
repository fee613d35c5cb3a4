package graft

import graft.operators.Events
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamJoinSpec extends GraftSpec {

  case class RawEvt(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  test("stream-stream interval join matches the batch equivalent") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val all = Events.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => RawEvt(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val purchases = all.filter(_.event_type == "purchase")
    val signups = all.filter(_.event_type == "signup")

    val memP = MemoryStream[RawEvt]
    val memS = MemoryStream[RawEvt]
    val out = Streams.purchaseSignupJoin(memP.toDF(), memS.toDF())
    val q = out.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      memP.addData(purchases)
      memS.addData(signups)
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_out")
        .select("purchase_id", "signup_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = (for {
        p <- purchases; s <- signups
        if p.user_id == s.user_id
        if p.ts.getTime >= s.ts.getTime
        if p.ts.getTime <= s.ts.getTime + 7L * 24 * 3600 * 1000
      } yield (p.event_id, s.event_id)).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"streamed ${streamed.size} pairs vs batch ${batch.size}")
    } finally q.stop()
  }
}
