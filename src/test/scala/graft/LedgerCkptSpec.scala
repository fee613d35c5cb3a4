package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Ledger checkpoints (Lake.compactLedger): metadata compaction — fold
  * the per-commit ledger files into one checkpoint, prune them, and keep
  * EVERY read surface byte-identical (current read, time travel,
  * incremental reads, history, lifecycle continuation). Crash windows
  * (checkpoint written, prune not run) must read exactly once.
  */
class LedgerCkptSpec extends GraftSpec {

  private def fresh(): (String, String, String) = {
    val t = Files.createTempDirectory("graft_ckpt_spec").toString
    (s"$t/landing", s"$t/ledger", s"$t/gen")
  }

  /** Ingest `waves` disjoint nation slices as separate commits. */
  private def landWaves(landing: String, ledger: String, waves: Int): Long = {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    (0 until waves).foreach { i =>
      nation.filter(col("n_nationkey") % waves === i)
        .write.mode("append").parquet(s"$landing/w$i")
      Lake.ingestNewFiles(spark, s"$landing/w$i", ledger)
    }
    Lake.currentSnapshot(spark, ledger)
  }

  private def ledgerFiles(ledger: String): Int =
    Option(new java.io.File(ledger).listFiles()).getOrElse(Array.empty)
      .count(_.getName.endsWith(".parquet"))

  private def state(ledger: String, snap: Long): Set[Long] =
    Lake.readAt(spark, ledger, snap)
      .select("n_nationkey").collect()
      .map(_.getAs[Number](0).longValue).toSet

  test("checkpoint preserves every read surface, prunes commit files, " +
      "and the lifecycle continues") {
    val (landing, ledger, gen) = fresh()
    val head = landWaves(landing, ledger, 5)
    assert(head == 5)
    val before = (1L to head).map(s => s -> state(ledger, s)).toMap
    val histBefore = Lake.history(spark, ledger).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet // (snapshot, n_added)
    val sinceBefore = Lake.readSince(spark, ledger, 3).count()
    val filesBefore = ledgerFiles(ledger)
    assert(filesBefore >= 5)

    assert(Lake.compactLedger(spark, ledger) == head)
    assert(ledgerFiles(ledger) < filesBefore, "commit files not pruned")
    // idempotent: a re-run with no intervening commits is a covered
    // no-op, never a rename-collision error
    assert(Lake.compactLedger(spark, ledger) == head)
    // every surface identical
    (1L to head).foreach(s => assert(state(ledger, s) == before(s),
      s"time travel to $s diverged after checkpoint"))
    assert(Lake.history(spark, ledger).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet == histBefore)
    assert(Lake.readSince(spark, ledger, 3).count() == sinceBefore)
    // lifecycle continues: a merge lands as snapshot head+1 and reads
    val upd = spark.read.parquet(s"$sf/nation.parquet")
      .limit(3).withColumn("n_name", lit("PATCHED"))
    val snap = Lake.mergeInto(spark, ledger, gen, upd, "n_nationkey")
    assert(snap == head + 1)
    assert(Lake.readAt(spark, ledger, snap)
      .filter(col("n_name") === "PATCHED").count() == 3)
    // a second checkpoint covers the merge and supersedes the first
    assert(Lake.compactLedger(spark, ledger) == snap)
    val ckpts = new java.io.File(s"$ledger/_ckpt").listFiles()
      .filter(_.getName.startsWith("ckpt-")).map(_.getName).toSeq
    assert(ckpts == Seq(s"ckpt-$snap"), s"old checkpoint not superseded: $ckpts")
    assert(Lake.readAt(spark, ledger, snap)
      .filter(col("n_name") === "PATCHED").count() == 3)
    assert(state(ledger, 2) == before(2L))
  }

  test("crash window — checkpoint written, prune never ran: rows read " +
      "exactly once; torn temp dirs are invisible") {
    val (landing, ledger, _) = fresh()
    val head = landWaves(landing, ledger, 4)
    val rowsBefore = Lake.readAt(spark, ledger, head).count()
    val filesBefore = ledgerFiles(ledger)
    // simulate the crash: write the checkpoint exactly as compactLedger
    // does, but leave every per-commit file in place
    val rows = spark.read.option("mergeSchema", "true").parquet(ledger)
      .localCheckpoint()
    rows.coalesce(1).write.parquet(s"$ledger/_ckpt/.tmp-$head")
    assert(new java.io.File(s"$ledger/_ckpt/.tmp-$head")
      .renameTo(new java.io.File(s"$ledger/_ckpt/ckpt-$head")))
    assert(ledgerFiles(ledger) == filesBefore, "fixture must not prune")
    // duplicated provenance must dedupe: same row count, same snapshot
    assert(Lake.currentSnapshot(spark, ledger) == head)
    assert(Lake.readAt(spark, ledger, head).count() == rowsBefore)
    assert(Lake.readSince(spark, ledger, 0).count() == rowsBefore,
      "incremental read double-fed covered rows")
    // a torn HALF-written checkpoint (crash before rename) is invisible
    rows.coalesce(1).write.parquet(s"$ledger/_ckpt/.tmp-99")
    assert(Lake.currentSnapshot(spark, ledger) == head)
    assert(Lake.readAt(spark, ledger, head).count() == rowsBefore)
  }
}
