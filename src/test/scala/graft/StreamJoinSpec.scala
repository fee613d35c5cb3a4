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

  test("stream-stream LEFT OUTER join: matches stream through, unmatched " +
      "signups emit NULL rows at watermark eviction — batch-equal") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val all = Events.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => RawEvt(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val purchases = all.filter(_.event_type == "purchase")
    val maxTs = all.map(_.ts.getTime).max
    // guarantee at least one never-matching signup regardless of fixture
    // overlap: a user id no purchase carries
    val signups = all.filter(_.event_type == "signup") :+
      RawEvt(900001L, new Timestamp(maxTs - 1000), 999999L, "signup", 0.0)

    val memP = MemoryStream[RawEvt]
    val memS = MemoryStream[RawEvt]
    val out = Streams.signupPurchaseOuterJoin(memS.toDF(), memP.toDF())
    val q = out.writeStream.format("memory").queryName("ssjoin_outer_out")
      .outputMode("append").start()
    try {
      memP.addData(purchases)
      memS.addData(signups)
      q.processAllAvailable()
      // outer null rows emit only once the watermark passes the match
      // horizon: advance BOTH sides far past maxTs + 7d, over two
      // triggers (eviction happens on the batch AFTER the advance)
      val flush1 = new Timestamp(maxTs + 9L * 24 * 3600 * 1000)
      val flush2 = new Timestamp(maxTs + 10L * 24 * 3600 * 1000)
      memP.addData(RawEvt(-1L, flush1, -1L, "purchase", 0.0))
      memS.addData(RawEvt(-2L, flush1, -2L, "signup", 0.0))
      q.processAllAvailable()
      memP.addData(RawEvt(-3L, flush2, -1L, "purchase", 0.0))
      memS.addData(RawEvt(-4L, flush2, -2L, "signup", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_outer_out")
        .filter(col("signup_id") >= 0) // the flush rows are fixture
        .collect()
        .map(r => (r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      val matched = (for {
        s <- signups; p <- purchases
        if p.user_id == s.user_id
        if p.ts.getTime >= s.ts.getTime
        if p.ts.getTime <= s.ts.getTime + 7L * 24 * 3600 * 1000
      } yield (s.event_id, p.event_id)).toSet
      val matchedSignups = matched.map(_._1)
      val batch = matched ++ signups.filterNot(s =>
        matchedSignups(s.event_id)).map(s => (s.event_id, -1L))
      assert(batch.exists(_._2 == -1L), "fixture must have unmatched signups")
      assert(batch.exists(_._2 >= 0), "fixture must have matched signups")
      assert(streamed == batch,
        s"streamed ${streamed.size} rows vs batch ${batch.size}")
    } finally q.stop()
  }
}
