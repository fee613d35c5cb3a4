package graft

import graft.sources.{GraftTable, Lake}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Manifest data skipping: per-file min/max stats recorded in the ledger at
  * ingest let readAt's LedgerFileIndex prune files against pushed filters
  * WITHOUT opening them — the manifest's whole point at 100 TB. */
class DataSkipSpec extends GraftSpec {

  /** Files actually opened by the (finalized) scan of `df`. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // finalize the adaptive plan + populate metrics
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.sum
  }

  test("point and range filters on the stats column open only matching files") {
    val root = Files.createTempDirectory("graft_skip").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    // range-cluster the landing files by key → disjoint per-file ranges
    cust.repartitionByRange(8, col("c_custkey"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCol = Some("c_custkey"))

    val all = t.read()
    assert(scannedFiles(all) == 8, "full scan opens all files")

    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    val point = t.read().filter(col("c_custkey") === k)
    assert(scannedFiles(point) == 1, "point query must open exactly one file")
    assert(point.count() == cust.filter(col("c_custkey") === k).count())

    val hi = cust.agg(max(col("c_custkey"))).head().getLong(0)
    val range = t.read().filter(col("c_custkey") > hi - 10)
    val nRange = scannedFiles(range)
    assert(nRange <= 2, s"tail range query opened $nRange of 8 files")
    assert(range.count() == cust.filter(col("c_custkey") > hi - 10).count())

    // a filter on a DIFFERENT column must never skip (no stats for it)
    val other = t.read().filter(col("c_mktsegment") === "BUILDING")
    assert(scannedFiles(other) == 8)
    assert(other.count() ==
      cust.filter(col("c_mktsegment") === "BUILDING").count())
  }

  test("skipping survives compaction and absent stats never skip") {
    val root = Files.createTempDirectory("graft_skip2").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    cust.repartitionByRange(6, col("c_custkey"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCol = Some("c_custkey"))
    // compact to 3 range-clustered files — stats recomputed for the new
    // generation, so skipping keeps working after the rewrite.
    // NOTE: plain repartition would destroy clustering (and with it the
    // skip selectivity) — the stats would still be CORRECT, just wide.
    val preRows = t.read().count()
    t.compact(cust.count() / 3 + 1)
    assert(t.read().count() == preRows)
    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    val point = t.read().filter(col("c_custkey") === k)
    val opened = scannedFiles(point)
    val total = scannedFiles(t.read())
    assert(opened < total, s"post-compaction point query opened $opened/$total")
    assert(point.count() == 1)

    // a statless ingest into the same table: its files never skip
    val root2 = Files.createTempDirectory("graft_skip3").toString
    val t2 = GraftTable(spark, s"$root2/ledger", s"$root2/gen")
    cust.repartitionByRange(4, col("c_custkey"))
      .write.parquet(s"$root2/landing")
    t2.ingest(s"$root2/landing") // no statsCol
    val p2 = t2.read().filter(col("c_custkey") === k)
    assert(scannedFiles(p2) == 4, "without stats every file must be opened")
    assert(p2.count() == 1)
  }
}
