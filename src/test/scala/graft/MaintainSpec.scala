package graft

import graft.sources.{GraftTable, Lake}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Policy-driven maintenance: one `maintain()` call reads the manifest,
  * fixes exactly what the table needs (missing stats, small-file bloat,
  * expired reachability), and is a no-op on a healthy table. */
class MaintainSpec extends GraftSpec {

  test("maintain: restat + compact + expire only when needed; idempotent") {
    val root = Files.createTempDirectory("graft_maintain").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))

    // wave 1 WITH the skipping contract; wave 2 lands stats-less small
    // files (the deficient + bloated state maintenance must repair)
    cust.filter(col("c_custkey") % 2 === 0)
      .repartitionByRange(4, col("c_custkey"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_custkey"))
    cust.filter(col("c_custkey") % 2 === 1)
      .repartition(8).write.mode("append").parquet(s"$root/landing")
    t.ingest(s"$root/landing") // no statsCols: 8 stats-less files
    val rows = t.read().count()
    assert(rows == cust.count())
    val statless = t.files().filter(col("stats").isNull).count()
    assert(statless == 8, s"fixture expects 8 deficient files, got $statless")

    val policy = Lake.MaintenancePolicy(
      smallFileBytes = 1L << 20, compactMinSmallFiles = 8,
      targetRowsPerFile = 100000, retainSnapshots = 1)
    val r1 = t.maintain(policy)
    assert(r1.restatted == 8, "the 8 contract-deficient files restat")
    assert(r1.compacted && r1.smallFiles >= 8, "small-file bloat compacts")
    assert(r1.expired > 0, "replaced pre-compaction files expire")
    // the table reads the same and keeps its skipping contract
    assert(t.read().count() == rows)
    assert(t.files().filter(col("stats").isNull).count() == 0,
      "every live file carries stats after maintenance")
    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    assert(t.read().filter(col("c_custkey") === k).count() ==
      cust.filter(col("c_custkey") === k).count())

    // healthy table: second pass changes nothing
    val r2 = t.maintain(policy.copy(retainSnapshots = 0))
    assert(!r2.compacted && r2.restatted == 0 && r2.expired == 0,
      s"maintenance must be idempotent, got $r2")
    assert(r2.snapshot == r1.snapshot)
    assert(t.read().count() == rows)
  }

  test("maintain: ledger-checkpoint threshold fires once, then idles") {
    import graft.sources.{GraftTable, Lake}
    import org.apache.spark.sql.functions._
    val tdir = java.nio.file.Files.createTempDirectory("graft_maint_ckpt").toString
    val t = GraftTable(spark, s"$tdir/ledger", s"$tdir/gen")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    (0 until 5).foreach { i =>
      nation.filter(col("n_nationkey") % 5 === i)
        .write.parquet(s"$tdir/landing/w$i")
      t.ingest(s"$tdir/landing/w$i")
    }
    def ledgerFiles() =
      Option(new java.io.File(s"$tdir/ledger").listFiles())
        .getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    assert(ledgerFiles() >= 4)
    val rows = t.read().count()
    val policy = Lake.MaintenancePolicy(compactMinSmallFiles = 999,
      maxLedgerFiles = 4)
    val r1 = t.maintain(policy)
    assert(r1.ledgerCheckpointed, s"threshold crossed but no checkpoint: $r1")
    assert(ledgerFiles() < 4)
    assert(t.read().count() == rows)
    val r2 = t.maintain(policy)
    assert(!r2.ledgerCheckpointed, s"idle table re-checkpointed: $r2")
  }

  test("scoped compaction (OPTIMIZE WHERE): only the predicate's file " +
      "footprint rewrites; rows and untouched files intact") {
    import graft.sources.{GraftTable, Lake}
    import org.apache.spark.sql.functions._
    val tdir = java.nio.file.Files.createTempDirectory("graft_opt_where").toString
    val t = GraftTable(spark, s"$tdir/ledger", s"$tdir/gen")
    // range-clustered landing: each file owns a disjoint custkey range,
    // stats recorded so the match scan can prune
    spark.read.parquet(s"$sf/customer.parquet")
      .repartitionByRange(6, col("c_custkey"))
      .write.parquet(s"$tdir/landing")
    t.ingest(s"$tdir/landing", statsCols = Seq("c_custkey"))
    val rows = t.read().count()
    val filesBefore = t.files().select("path").collect()
      .map(_.getString(0)).toSet
    assert(filesBefore.size == 6)
    val cut = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("percentile(c_custkey, 0.25)").head().getDouble(0).toLong
    val snap = t.compact(targetRowsPerFile = 1000000,
      where = Some(col("c_custkey") <= cut))
    assert(snap > 0)
    val filesAfter = t.files().select("path").collect()
      .map(_.getString(0)).toSet
    val untouched = filesBefore.intersect(filesAfter)
    assert(untouched.nonEmpty, "scoped compaction rewrote everything")
    assert(filesAfter.size < filesBefore.size, "nothing was compacted")
    // the low range's files are exactly the rewritten ones: every
    // surviving original file's range must sit ABOVE the cut
    assert(t.read().count() == rows)
    assert(t.read().select("c_custkey").distinct().count() ==
      spark.read.parquet(s"$sf/customer.parquet").count())
    // a predicate matching nothing is a snapshot-free no-op
    val head = t.snapshot
    assert(t.compact(1000000, where = Some(col("c_custkey") < -5)) == 0L)
    assert(t.snapshot == head && t.orphans().isEmpty)
  }
}