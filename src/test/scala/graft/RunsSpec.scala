package graft

import graft.operators.{Events, Runs}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class RunsSpec extends GraftSpec {

  test("runs dimension covers all events with consistent bounds") {
    val runs = Runs.runs(spark, sf).collect()
    assert(runs.nonEmpty)
    runs.foreach { r =>
      val start = r.getAs[java.sql.Timestamp]("run_start")
      val stop = r.getAs[java.sql.Timestamp]("run_stop")
      val num = r.getAs[Long]("run_number")
      assert(!start.after(stop))
      // bounds live inside the run's 8h epoch bucket
      assert(start.getTime / 1000 / Runs.RunSeconds == num)
      assert(stop.getTime / 1000 / Runs.RunSeconds == num)
      assert(r.getAs[String]("config_name") == s"iceberg_daq_v${num % 4}")
    }
  }

  test("run summary totals reconcile with raw events") {
    val summary = Runs.qRunSummary(spark, sf).collect()
    val total = Events.events(spark, sf).count()
    assert(summary.map(_.getAs[Long]("n_events")).sum == total)
    summary.foreach { r =>
      assert(r.getAs[Long]("n_dup_events") == 0L) // event_id unique in testdata
      assert(r.getAs[Long]("duration_us") >= 0L)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
    }
  }

  test("per-run partitioned write prunes partitions for run predicates") {
    val out = Files.createTempDirectory("graft_runs").toString
    val events = Events.events(spark, sf)
    Runs.writeEventsByRun(events, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(_.getName.startsWith("run_number=")))

    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    val firstRun = dirs.map(_.getName.stripPrefix("run_number=").toLong).min
    val one = back.filter(col("run_number") === firstRun)
    val p = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(p.contains("PartitionFilters: [isnotnull(run_number"),
      s"run predicate did not become a partition filter:\n${p.take(800)}")
  }
}
