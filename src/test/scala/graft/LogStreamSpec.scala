package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming operational-log monitor: log lines arriving over a stream
  * produce the same per-(script, level) counts as the batch parse over
  * everything landed — across multiple micro-batches, with colored and
  * malformed lines interleaved exactly as a captured stream carries them.
  */
class LogStreamSpec extends GraftSpec {

  private def line(script: String, hhmmss: String, level: String,
      msg: String, colored: Boolean): String = {
    val body = s"[iceberg-daq | $script | 2025-03-02 $hhmmss] $level: $msg"
    if (colored) s"\u001b[38;5;203m$body\u001b[0m" else body
  }

  test("streamed per-script counts equal the batch parse over all landed lines") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val lines = Seq(
      line("power_fembs.sh", "08:00:01", "INFO", "starting step", colored = false),
      line("power_fembs.sh", "08:00:05", "ERROR", "FEMB current out of range", colored = true),
      "  at daq.fakestack.Frame.run(Frame.java:42)", // malformed: must drop
      line("start_run.sh", "08:01:00", "INFO", "run registered", colored = true),
      "",
      line("power_fembs.sh", "08:02:11", "WARNING", "retrying after timeout", colored = false),
      line("start_run.sh", "08:03:30", "ERROR", "timing endpoint not locked", colored = true),
      line("check_links.sh", "08:04:00", "INFO", "link alignment ok", colored = false))
    val (first, second) = lines.splitAt(4)

    val mem = MemoryStream[String]
    val query = Streams.logMonitor(mem.toDF()).writeStream
      .format("memory").queryName("log_monitor_out")
      .outputMode("complete").start()
    try {
      mem.addData(first)
      query.processAllAvailable()
      val mid = spark.table("log_monitor_out").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // stack-trace line dropped; three conforming lines so far
      assert(mid.values.sum == 3)
      assert(mid(("power_fembs.sh", "ERROR")) == 1)

      mem.addData(second)
      query.processAllAvailable()
      val streamed = spark.table("log_monitor_out").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = Streams.logMonitor(lines.toDF("value")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        "streamed counts must equal the batch parse over all landed lines")
      assert(streamed.values.sum == 6) // 8 landed lines, 2 malformed
    } finally query.stop()
  }
}
