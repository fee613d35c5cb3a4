package graft

import graft.operators.{Events, Runs}
import graft.sources.Configs
import org.apache.spark.sql.functions._

class ConfigsSpec extends GraftSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("config kv flattens every scalar/array leaf with dotted paths") {
    val kv = Configs.kv(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(kv(("base_cosmic", "boot.base_command_port")) == "3333")
    assert(kv(("base_cosmic", "boot.use_connectivity_service")) == "true")
    assert(kv(("base_cosmic", "boot.capture_env_vars"))
      == """["TIMING_SHARE","CHANNELMAP_SHARE"]""")
    assert(kv(("gen_cosmic_run1", "trigger.tpg_threshold")) == "120")
    // keys a config does not set are ABSENT, not null
    assert(!kv.contains(("base_cosmic", "trigger.tpg_threshold")))
    assert(!kv.contains(("base_cosmic", "pulser.pulser_enabled")))
    assert(kv(("base_pulser", "pulser.pulser_enabled")) == "true")
  }

  test("config diff classifies changed/only_a/only_b") {
    val d = Configs.configDiff(spark, "base_cosmic", "gen_cosmic_run1")
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)), r.getString(3))).toMap
    assert(d("boot.ers_impl") == (Some("local"), Some("central"), "changed"))
    assert(d("trigger.trigger_rate_hz") == (Some("10"), Some("25"), "changed"))
    assert(d("readout.enable_raw_recording") == (Some("false"), Some("true"), "changed"))
    assert(d("trigger.tpg_threshold") == (None, Some("120"), "only_b"))
    assert(d("readout.enabled_units") == (None, Some("[101,102,105,106]"), "only_b"))
    // unchanged keys are omitted
    assert(!d.contains("boot.base_command_port"))
    assert(!d.contains("readout.clock_speed_hz"))
  }

  test("authoritative runs dim loads with explicit schema and sane ranges") {
    val r = Runs.authoritativeRuns(spark)
    val rows = r.orderBy(col("run_number")).collect()
    assert(rows.length > 50)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "run_number unique")
    rows.foreach { row =>
      assert(row.getTimestamp(3).before(row.getTimestamp(4)), "start < stop")
    }
    // non-overlapping, increasing
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(!a.getTimestamp(4).after(b.getTimestamp(3)), "runs do not overlap")
      case _ =>
    }
  }

  test("events joined to the authoritative dim reproduce the derived run summary") {
    // Write run-control records derived from the 8h-bucket dim, load them
    // through the authoritative path, and check the time-range join
    // reproduces qRunSummary's per-run event counts: proves the ingest path
    // and the derived fallback agree when the boundaries coincide.
    val derived = Runs.runs(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("graft_runs").toFile
    val path = new java.io.File(tmp, "runs.jsonl").getAbsolutePath
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
    val recs = derived.collect().map { r =>
      val start = r.getAs[java.sql.Timestamp]("run_start")
      val stop = r.getAs[java.sql.Timestamp]("run_stop")
      // derived run_stop is the max event ts (inclusive); the authoritative
      // contract is [start, stop), so emit stop + 1us
      s"""{"run_number": ${r.getAs[Long]("run_number")}, "config_name": "${r.getAs[String]("config_name")}", "purpose": "derived", "start_ts": "${fmt.format(start.toInstant)}", "stop_ts": "${fmt.format(stop.toInstant.plusNanos(1000))}"}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      recs.mkString("\n").getBytes)

    val joined = Runs.eventsWithAuthRun(Events.events(spark, sf),
        Runs.authoritativeRuns(spark, path))
      .groupBy(col("run_number")).agg(count(lit(1)).as("n_events"))
      .as[(Long, Long)].collect().toMap
    val expected = Runs.qRunSummary(spark, sf)
      .select(col("run_number"), col("n_events"))
      .as[(Long, Long)].collect().toMap
    assert(joined == expected)
  }

  test("q_runs_auth drops events in inter-run gaps") {
    val total = Events.events(spark, sf).count()
    val inRuns = Runs.qRunsAuth(spark, sf).agg(sum(col("n_events"))).as[Long].head()
    assert(inRuns > 0 && inRuns < total,
      s"gap events must be dropped (got $inRuns of $total)")
  }

  test("q_run_config_diff emits key-level changes for consecutive runs") {
    val d = Runs.qRunConfigDiff(spark)
    val rows = d.collect()
    assert(rows.nonEmpty)
    // every consecutive pair in the fixture cycles configs, so every run
    // after the first appears; spot-check a known transition:
    // base_cosmic -> gen_pulser_run2 adds pulser.* and changes trigger keys
    val byRun = rows.groupBy(_.getLong(0))
    val aPulserRun = byRun.values.find(_.exists(r =>
      r.getString(2) == "pulser.pulser_enabled" && r.getString(5) == "added"))
    assert(aPulserRun.isDefined, "expected an 'added' pulser key transition")
    rows.foreach { r =>
      val (v, pv, ch) = (Option(r.getString(3)), Option(r.getString(4)), r.getString(5))
      ch match {
        case "added"   => assert(v.isDefined && pv.isEmpty)
        case "removed" => assert(v.isEmpty && pv.isDefined)
        case "changed" => assert(v.isDefined && pv.isDefined && v != pv)
        case other     => fail(s"unknown change tag $other")
      }
    }
  }
}
