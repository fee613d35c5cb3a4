package graft

import graft.operators.Events
import graft.sources.Lake
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LedgerSpec extends GraftSpec {

  private def landFiles(dir: String, tag: String, n: Int): Unit =
    Events.events(spark, sf).filter(col("event_type") === tag)
      .repartition(n).write.mode("append").parquet(dir)

  // each test gets a fresh landing dir + ledger; files land as parquet parts
  private def fresh(): (String, String) =
    (Files.createTempDirectory("graft_landing").toString,
      Files.createTempDirectory("graft_ledger").toString + "/ledger")

  test("ingest is idempotent and snapshots increment") {
    val (landing, ledger) = fresh()
    landFiles(landing, "click", 3)
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 3)
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 0) // re-run no-op
    landFiles(landing, "view", 2)
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 2)
    assert(Lake.currentSnapshot(spark, ledger) == 2)
  }

  test("schema quarantine: type-conflicting files never enter the ledger") {
    val (landing, ledger) = fresh()
    landFiles(landing, "click", 2)
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 2)
    // a file with event_id as STRING type-conflicts with the table; a
    // file with an EXTRA column is schema evolution and must ingest
    val ss = spark
    import ss.implicits._
    Seq(("not-a-long", 1L)).toDF("event_id", "user_id")
      .coalesce(1).write.parquet(s"$landing/bad")
    val badFile = new java.io.File(s"$landing/bad").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val badDst = new java.io.File(landing, "conflict.parquet")
    assert(badFile.renameTo(badDst))
    Events.events(spark, sf).filter(col("event_type") === "view").limit(5)
      .withColumn("extra_col", lit(1L))
      .coalesce(1).write.mode("append").parquet(landing)
    // only the evolved file ingests; the conflicting one is quarantined
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 1)
    // the table still reads end-to-end (no poisoned file in the live set)
    assert(Lake.readAt(spark, ledger, Lake.currentSnapshot(spark, ledger))
      .count() > 0)
    // fix-and-retry: replacing the bad path with a valid file re-ingests
    assert(badDst.delete())
    Events.events(spark, sf).filter(col("event_type") === "click").limit(3)
      .coalesce(1).write.parquet(s"$landing/fix")
    val fixed = new java.io.File(s"$landing/fix").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(fixed.renameTo(badDst))
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 1)
  }

  test("missing _SUCCESS does not reset the ledger (partial-append robustness)") {
    val (landing, ledger) = fresh()
    landFiles(landing, "click", 3)
    Lake.ingestNewFiles(spark, landing, ledger)
    // r17: ledger commits are driver-written single files — no _SUCCESS
    // marker is produced at all (ledger presence is decided from DATA
    // files, never markers). A stray or absent marker must not matter
    // either way, so delete it if some older path left one.
    val marker = new java.io.File(ledger, "_SUCCESS")
    if (marker.exists()) assert(marker.delete())
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 0,
      "paths must not be re-ingested after marker loss")
    assert(Lake.currentSnapshot(spark, ledger) == 1, "snapshot ids must not restart")
  }

  test("readSince returns schema-carrying empty frame when nothing is new") {
    val (landing, ledger) = fresh()
    landFiles(landing, "click", 2)
    Lake.ingestNewFiles(spark, landing, ledger)
    val empty = Lake.readSince(spark, ledger, sinceSnapshot = 1)
    assert(empty.count() == 0)
    // the empty batch still projects event columns — callers select these
    assert(empty.columns.contains("event_id") && empty.columns.contains("ts"))
    assert(empty.select(col("event_id"), col("ts")).count() == 0)
  }

  test("compaction does not double-count: readSince skips the replace snapshot") {
    val (landing, ledger) = fresh()
    val compactDir = Files.createTempDirectory("graft_compacted").toString + "/data"
    landFiles(landing, "click", 4)
    Lake.ingestNewFiles(spark, landing, ledger)
    val before = Lake.readAt(spark, ledger, 1).count()

    Lake.compactIngested(spark, ledger, compactDir, targetRowsPerFile = 1000000)
    // live table rows unchanged by the rewrite
    val snap = Lake.currentSnapshot(spark, ledger)
    assert(snap == 2)
    assert(Lake.readAt(spark, ledger, snap).count() == before)
    // incremental consumer that checkpointed at 1 sees NOTHING new
    assert(Lake.readSince(spark, ledger, 1).count() == 0)
    // full incremental replay (since 0) yields exactly the original rows once
    assert(Lake.readSince(spark, ledger, 0).count() == before)
    // re-running ingest over the landing dir after compaction is a no-op
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 0)

    // RECURRING compaction into the SAME compactDir: each run writes a
    // fresh generation, never overwriting the files it reads
    Lake.compactIngested(spark, ledger, compactDir, targetRowsPerFile = 1000000)
    val snap2 = Lake.currentSnapshot(spark, ledger)
    assert(snap2 == 3)
    assert(Lake.readAt(spark, ledger, snap2).count() == before,
      "second compaction must preserve the live rows")
    assert(Lake.readSince(spark, ledger, 1).count() == 0,
      "both replace snapshots skipped by incremental consumers")
  }

  test("readAt time-travel is stable across later appends and compaction") {
    val (landing, ledger) = fresh()
    val compactDir = Files.createTempDirectory("graft_compacted2").toString + "/data"
    landFiles(landing, "click", 2)
    Lake.ingestNewFiles(spark, landing, ledger)
    val rowsAt1 = Lake.readAt(spark, ledger, 1).count()

    landFiles(landing, "view", 2)
    Lake.ingestNewFiles(spark, landing, ledger) // snapshot 2
    Lake.compactIngested(spark, ledger, compactDir, 1000000) // snapshot 3
    landFiles(landing, "error", 1)
    Lake.ingestNewFiles(spark, landing, ledger) // snapshot 4

    assert(Lake.readAt(spark, ledger, 1).count() == rowsAt1, "snapshot 1 pinned")
    val at2 = Lake.readAt(spark, ledger, 2).count()
    assert(Lake.readAt(spark, ledger, 3).count() == at2, "replace keeps rows")
    assert(Lake.readAt(spark, ledger, 4).count() > at2)
    // post-compaction readAt reads COMPACTED files (old paths removed)
    val live = Lake.readAt(spark, ledger, 3).inputFiles
    assert(live.forall(_.contains("graft_compacted2")),
      s"snapshot 3 must read compacted files, got ${live.take(2).mkString(",")}")
  }

  test("expireSnapshots reclaims replaced files, bounds time travel, keeps the present") {
    val (landing, ledger) = fresh()
    val compactDir = Files.createTempDirectory("graft_vacuum").toString + "/data"
    landFiles(landing, "click", 3)
    Lake.ingestNewFiles(spark, landing, ledger)          // snapshot 1
    landFiles(landing, "view", 2)
    Lake.ingestNewFiles(spark, landing, ledger)          // snapshot 2
    Lake.compactIngested(spark, ledger, compactDir, 1000000) // snapshot 3 (replace)
    val current = Lake.currentSnapshot(spark, ledger)
    val rowsNow = Lake.readAt(spark, ledger, current).count()
    val rowsAt1 = Lake.readAt(spark, ledger, 1).count()
    assert(rowsAt1 < rowsNow)

    // retain only the compacted present: the 5 replaced landing files die
    val deleted = Lake.expireSnapshots(spark, ledger, retainFrom = current)
    assert(deleted == 5, s"expected the 5 pre-compaction files deleted, got $deleted")
    assert(Lake.readAt(spark, ledger, current).count() == rowsNow,
      "current snapshot unaffected by vacuum")
    // time travel below the horizon is explicitly gone (files deleted)
    intercept[Exception] { Lake.readAt(spark, ledger, 1).count() }
    // expiry is itself a snapshot; re-running reclaims nothing further AND
    // appends no further audit snapshots (idempotent)
    assert(Lake.currentSnapshot(spark, ledger) == current + 1)
    assert(Lake.expireSnapshots(spark, ledger, Lake.currentSnapshot(spark, ledger)) == 0)
    assert(Lake.currentSnapshot(spark, ledger) == current + 1,
      "a no-op expiry must not append a snapshot")
    // incremental consumers at the compaction checkpoint still see nothing new
    assert(Lake.readSince(spark, ledger, current).count() == 0)
    // a consumer checkpointed BEFORE the horizon fails loudly with the
    // horizon error — never a silent row drop or a mid-scan FileNotFound
    val ex = intercept[IllegalStateException] { Lake.readSince(spark, ledger, 0) }
    assert(ex.getMessage.contains("incremental horizon passed"))
    val ex2 = intercept[IllegalStateException] { Lake.readSnapshot(spark, ledger, 1) }
    assert(ex2.getMessage.contains("incremental horizon passed"))
  }

  test("readAt scans through the manifest-driven LedgerFileIndex") {
    val (landing, ledger) = fresh()
    landFiles(landing, "click", 3)
    Lake.ingestNewFiles(spark, landing, ledger)
    val df = Lake.readAt(spark, ledger, 1)
    // the scan's file source must be the ledger-fed index (file list +
    // sizes from the manifest, no filesystem walk, no driver path list
    // materialized by readAt itself)
    val locations = df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location
    }
    assert(locations.nonEmpty && locations.forall(
      _.isInstanceOf[graft.sources.LedgerFileIndex]),
      s"readAt must plan over LedgerFileIndex, got $locations")
    // and the scan reads exactly the landed rows
    assert(df.count() ==
      Events.events(spark, sf).filter(col("event_type") === "click").count())
  }

  test("garbage uploads are quarantined: never ledgered, reads stay healthy, fix-and-retry works") {
    val (landing, ledger) = fresh()
    landFiles(landing, "click", 2)
    // a torn upload / junk named *.parquet (no PAR1 magic)
    val junk = new java.io.File(landing, "torn-upload.parquet")
    java.nio.file.Files.write(junk.toPath, "not a parquet file".getBytes)
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 2,
      "only the two valid files may ingest")
    // the table reads cleanly — the junk never entered the ledger
    val expected = Events.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(Lake.readAt(spark, ledger, 1).count() == expected)
    // fix the file (a valid re-upload) → the next ingest picks it up,
    // because quarantine skips the path instead of ledgering it
    junk.delete()
    val fixDir = Files.createTempDirectory("graft_fix").toString
    Events.events(spark, sf).filter(col("event_type") === "error")
      .coalesce(1).write.mode("overwrite").parquet(fixDir)
    val part = new java.io.File(fixDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath, junk.toPath)
    assert(Lake.ingestNewFiles(spark, landing, ledger) == 1)
    val errs = Events.events(spark, sf)
      .filter(col("event_type") === "error").count()
    assert(Lake.readAt(spark, ledger, 2).count() == expected + errs)
  }

  test("incremental and merge reads also plan through LedgerFileIndex") {
    def indexLocations(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation
            .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location
      }
    val (landing, ledger) = fresh()
    landFiles(landing, "click", 3)
    Lake.ingestNewFiles(spark, landing, ledger)
    for (df <- Seq(Lake.readSince(spark, ledger, 0),
        Lake.readSnapshot(spark, ledger, 1))) {
      val locs = indexLocations(df)
      assert(locs.nonEmpty && locs.forall(
        _.isInstanceOf[graft.sources.LedgerFileIndex]),
        s"incremental read must plan over LedgerFileIndex, got $locs")
    }
    // rows surface exactly once through the manifest-driven path
    val expected = Events.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(Lake.readSince(spark, ledger, 0).count() == expected)
  }

  test("same-bucketed tables join with zero exchanges") {
    val bcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Lake.writeBucketed(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_totalprice")),
        "g_orders_bucketed", "o_orderkey", 8)
      Lake.writeBucketed(Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "g_lineitem_bucketed", "o_orderkey", 8)
      val j = spark.table("g_orders_bucketed")
        .join(spark.table("g_lineitem_bucketed"), "o_orderkey")
      j.write.format("noop").mode("overwrite").save()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(1500)}")
      // and it is not an accidental broadcast: the join is sort-merge
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
      assert(j.count() == Tables.lineitem(spark, sf).count(),
        "every lineitem matches exactly one order")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcastWas)
      spark.sql("DROP TABLE IF EXISTS g_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_bucketed")
    }
  }
}
