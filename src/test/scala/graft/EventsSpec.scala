package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends GraftSpec {

  test("events loader yields microsecond timestamps (ns truncated)") {
    val e = Events.events(spark, sf)
    assert(e.schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(e.count() > 0)
  }

  test("sessionize: session count per user matches a driver-side replay") {
    val evts = Events.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evts.groupBy(_._1).map { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).toList
      val gaps = sorted.zip(sorted.drop(1))
        .count { case (a, b) => b._2 - a._2 > 30L * 60 * 1000000 }
      uid -> (gaps + 1)
    }
    val got = Events.qEvtSessionize(spark, sf)
      .groupBy("user_id").agg(countDistinct("session_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
  }

  test("as-of join: matched signup precedes the purchase") {
    val rows = Events.qEvtAsof(spark, sf)
      .filter(col("last_signup_ts").isNotNull)
      .select(col("ts").cast("long"), col("last_signup_ts").cast("long"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0)))
  }

  test("keep-latest dedup has one row per (user, type)") {
    val out = Events.qEvtDedupLatest(spark, sf)
    assert(out.count() ==
      out.select("user_id", "event_type").distinct().count())
  }
}
