package graft

import graft.operators.Events
import graft.sources.{Dromap, Lake}
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends GraftSpec {

  /** A dromap-format JSON file (structure mirrors the reference layout). */
  private def writeDromap(): String = {
    val dir = Files.createTempDirectory("graft_dromap")
    val json =
      """[
        | {"src_id": 0,
        |  "geo_id": {"det_id": 3, "crate_id": 8, "slot_id": 2, "stream_id": 0},
        |  "kind": "eth",
        |  "parameters": {"protocol": "udp", "rx_iface": "0"}},
        | {"src_id": 1,
        |  "geo_id": {"det_id": 3, "crate_id": 8, "slot_id": 2, "stream_id": 1},
        |  "kind": "eth",
        |  "parameters": {"protocol": "udp", "rx_iface": "0"}},
        | {"src_id": 2,
        |  "geo_id": {"det_id": 3, "crate_id": 8, "slot_id": 3, "stream_id": 0},
        |  "kind": "flx",
        |  "parameters": {}}
        |]""".stripMargin
    Files.writeString(dir.resolve("dromap.json"), json)
    dir.toString
  }

  test("dromap JSON loads with explicit nested schema and flattens") {
    val f = Dromap.flat(spark, writeDromap())
    assert(f.count() == 3)
    val r = f.filter(col("src_id") === 1).head()
    assert(r.getAs[Int]("det_id") == 3 && r.getAs[Int]("stream_id") == 1)
    assert(r.getAs[Map[String, String]]("parameters")("protocol") == "udp")
    assert(Dromap.validate(spark, writeDromap()).count() == 0)
  }

  test("dromap validation flags duplicate coordinates and unknown kinds") {
    val dir = Files.createTempDirectory("graft_dromap_bad")
    Files.writeString(dir.resolve("bad.json"),
      """[
        | {"src_id": 0, "geo_id": {"det_id": 3, "crate_id": 8, "slot_id": 2, "stream_id": 0}, "kind": "eth", "parameters": {}},
        | {"src_id": 0, "geo_id": {"det_id": 3, "crate_id": 8, "slot_id": 2, "stream_id": 0}, "kind": "wib", "parameters": {}}
        |]""".stripMargin)
    val violations = Dromap.validate(spark, dir.toString).collect().map(_.getString(0))
    assert(violations.exists(_.contains("duplicate src_id")))
    assert(violations.exists(_.contains("duplicate geo")))
    assert(violations.exists(_.contains("unknown kind")))
  }

  test("file-source streaming ingest: events dropped into a dir flow through the windowed agg") {
    val dropbox = Files.createTempDirectory("graft_dropbox").toString
    val batch = Events.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // first file lands before the stream starts
    batch.filter(col("event_id") < 500).coalesce(1)
      .write.mode("append").parquet(dropbox)

    val stream = Streams.readEventStream(spark, dropbox,
      batch.schema)
    val q = Streams.tumblingAgg(stream).writeStream
      .format("memory").queryName("file_ingest_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // second file lands mid-stream (the DAQ file-mover pattern)
      batch.filter(col("event_id") >= 500).coalesce(1)
        .write.mode("append").parquet(dropbox)
      q.processAllAvailable()
      // append-mode emits only watermark-closed windows; check subtotals of
      // what has closed match the batch aggregation for those windows
      val streamed = spark.table("file_ingest_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val full = Events.qEvtTumbling(spark, sf)
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      streamed.foreach { case (k, v) =>
        assert(full(k) == v, s"window $k: streamed $v vs batch ${full(k)}")
      }
    } finally q.stop()
  }

  test("streaming ingest resumes from checkpoint exactly-once across restarts") {
    val dropbox = Files.createTempDirectory("graft_dropbox2").toString
    val chk = Files.createTempDirectory("graft_chk").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val batch = Events.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")

    def startQuery() = Streams.readEventStream(spark, dropbox, batch.schema)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()

    // run 1 processes the first file, then the query STOPS (a restart —
    // deploy, crash, rescale; the checkpoint is the only carried state)
    batch.filter(col("event_id") < 400).coalesce(1)
      .write.mode("append").parquet(dropbox)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // more files land while no query is running
    batch.filter(col("event_id") >= 400 && col("event_id") < 700).coalesce(1)
      .write.mode("append").parquet(dropbox)

    // run 2 resumes from the checkpoint: must pick up ONLY the unprocessed
    // file — the already-committed one must not be re-emitted
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      batch.filter(col("event_id") >= 700).coalesce(1)
        .write.mode("append").parquet(dropbox)
      q2.processAllAvailable()
    } finally q2.stop()

    val result = spark.read.parquet(out)
    assert(result.count() == 1000, "every event exactly once across restarts")
    assert(result.select("event_id").distinct().count() == 1000, "no duplicates")
  }
}
