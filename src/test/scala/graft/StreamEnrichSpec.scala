package graft

import graft.operators.Events
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamEnrichSpec extends GraftSpec {

  case class RawEvt(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  private lazy val rawEvents: Seq[RawEvt] =
    Events.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => RawEvt(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))

  test("stream-static enrichment broadcasts the dim into every micro-batch") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val dromap = Seq(("click", 3), ("view", 3), ("purchase", 3),
      ("signup", 2), ("error", 2)).toDF("event_type", "det_id")
    val mem = MemoryStream[RawEvt]
    val q = Streams.enrichWithMap(mem.toDF(), dromap)
      .groupBy("det_id").count()
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      mem.addData(rawEvents.take(500))
      q.processAllAvailable()
      val got = spark.table("enrich_out").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val expected = rawEvents.take(500)
        .groupBy(e => if (Set("click", "view", "purchase")(e.event_type)) 3 else 2)
        .map { case (k, v) => k -> v.size.toLong }
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming run-stamping equals the batch time-range join") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val runsDim = graft.operators.Runs.authoritativeRuns(spark)
    val mem = MemoryStream[RawEvt]
    val q = Streams.stampWithRun(mem.toDF(), runsDim)
      .groupBy("run_number", "config_name").count()
      .writeStream.format("memory").queryName("runstamp_out")
      .outputMode("complete").start()
    try {
      mem.addData(rawEvents.take(400))
      q.processAllAvailable()
      mem.addData(rawEvents.slice(400, 800))
      q.processAllAvailable()
      val got = spark.table("runstamp_out").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val expected = {
        val sub = rawEvents.take(800)
          .map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
          .toDF("event_id", "ts", "user_id", "event_type", "value")
        graft.operators.Runs.eventsWithAuthRun(sub, runsDim)
          .groupBy("run_number", "config_name").count()
          .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      }
      assert(got == expected && got.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch lake sink lands partitioned parquet per micro-batch") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val out = Files.createTempDirectory("graft_stream_lake").toString
    val mem = MemoryStream[RawEvt]
    val q = Streams.sinkToLake(mem.toDF(), out).start()
    try {
      mem.addData(rawEvents.take(300))
      q.processAllAvailable()
      mem.addData(rawEvents.slice(300, 600))
      q.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() == 600)
      assert(back.columns.contains("event_date") && back.columns.contains("event_hour"))
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      assert(dirs.nonEmpty && dirs.forall(_.getName.startsWith("event_date=")))
    } finally q.stop()
  }
}
