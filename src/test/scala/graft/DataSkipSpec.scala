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
    t.ingest(s"$root/landing", statsCols = Seq("c_custkey"))

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

  test("bloom skipping: point lookups prune hash-scattered columns min/max cannot") {
    val root = Files.createTempDirectory("graft_skip_bloom").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    // HASH-distribute by name: every file's (name, key) ranges overlap, so
    // min/max bounds are full-range in all 8 files and never prune
    cust.repartition(8, col("c_name")).write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_name", "c_custkey"),
      bloomCols = Seq("c_name", "c_custkey"))

    assert(scannedFiles(t.read()) == 8)
    val name = cust.orderBy(col("c_custkey")).limit(1)
      .head().getAs[String]("c_name")
    // bounds overlap everywhere — without the bloom this opens all 8
    val point = t.read().filter(col("c_name") === name)
    val nPoint = scannedFiles(point)
    assert(nPoint <= 2, s"bloom point lookup opened $nPoint of 8 files")
    assert(point.count() == cust.filter(col("c_name") === name).count())
    // integral bloom column prunes the same way through its canonical form
    val k = cust.agg(max(col("c_custkey"))).head().getLong(0)
    val kPoint = t.read().filter(col("c_custkey") === k)
    assert(scannedFiles(kPoint) <= 2, "integral bloom point lookup must prune")
    assert(kPoint.count() == 1)
    // a value that exists nowhere opens (almost) nothing
    val absent = t.read().filter(col("c_name") === "no-such-customer-name")
    assert(scannedFiles(absent) <= 1, "absent key must prune to ~zero files")
    assert(absent.count() == 0)
    // range predicates ignore blooms (bounds full-range → all files);
    // correctness unaffected
    val range = t.read().filter(col("c_custkey") > k - 10)
    assert(range.count() == cust.filter(col("c_custkey") > k - 10).count())
    // no bloom on the un-bloomed column: its point probe opens all files
    assert(scannedFiles(
      t.read().filter(col("c_mktsegment") === "BUILDING")) == 8)

    // blooms survive compaction (recomputed per rewritten file)
    val preFiles = t.read().inputFiles.toSet
    t.compact(400)
    assert(t.read().inputFiles.toSet != preFiles, "compaction rewrote files")
    val nAfter = t.read().inputFiles.length
    val point2 = t.read().filter(col("c_name") === name)
    val n2 = scannedFiles(point2)
    assert(n2 < nAfter || nAfter <= 2,
      s"post-compaction bloom lookup opened $n2 of $nAfter files")
    assert(point2.count() == cust.filter(col("c_name") === name).count())
  }

  test("skipping survives compaction and absent stats never skip") {
    val root = Files.createTempDirectory("graft_skip2").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    cust.repartitionByRange(6, col("c_custkey"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_custkey"))
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
    t2.ingest(s"$root2/landing") // no statsCols
    val p2 = t2.read().filter(col("c_custkey") === k)
    assert(scannedFiles(p2) == 4, "without stats every file must be opened")
    assert(p2.count() == 1)
  }

  test("two-column stats prune independently per filtered column") {
    val root = Files.createTempDirectory("graft_skip4").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    // orthogonal clustering: c_custkey ranges vary across files while each
    // file spans one narrow band of keys; acctbal bands live per file too
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
    cust.repartitionByRange(8, col("c_custkey"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_custkey", "c_acctbal"))

    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    val byKey = t.read().filter(col("c_custkey") === k)
    assert(scannedFiles(byKey) == 1, "first column must still prune to one file")
    assert(byKey.count() == cust.filter(col("c_custkey") === k).count())

    // the second column's stats are full-range per file (keys and balances
    // are uncorrelated), so an impossible balance prunes EVERYTHING while a
    // plausible one reads all files — correct either way
    val none = t.read().filter(col("c_acctbal") > lit(1e12))
    assert(scannedFiles(none) == 0, "impossible balance must prune every file")
    assert(none.count() == 0)
    val both = t.read()
      .filter(col("c_custkey") === k && col("c_acctbal") > lit(-1e12))
    assert(scannedFiles(both) == 1, "conjunction prunes on each column's own stats")
    assert(both.count() == cust.filter(col("c_custkey") === k).count())

    // a filter on a column WITHOUT stats never skips
    val nation = t.read().filter(col("c_nationkey") === 3)
    assert(scannedFiles(nation) == 8)
    assert(nation.count() == cust.filter(col("c_nationkey") === 3).count())
  }

  test("fractional literals and non-integral stats columns prune soundly") {
    val root = Files.createTempDirectory("graft_skip5").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    // a DOUBLE stats column: floor/ceil must widen the stored long bounds
    // (a truncating cast would store max 5.9 as 5 and silently drop files)
    val df = spark.range(0, 100)
      .select(col("id"), (col("id") + lit(0.9)).as("v"))
    df.repartitionByRange(4, col("id")).write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("id", "v"))

    // fractional literal against the INTEGRAL column: id < 0.5 matches
    // id=0 — asLong-style truncation toward zero would compare lo < 0
    // and skip the file that contains it
    val low = t.read().filter(col("id") < lit(0.5))
    assert(low.count() == 1, "id < 0.5 must still see id = 0")
    // and id > -0.5 must not lose id = 0 either
    assert(t.read().filter(col("id") > lit(-0.5)).count() == 100)

    // the double column's top value 99.9 lives in the last file; ceil'd
    // stats (hi=100) must keep it for v > 99.5 (truncation would store 99)
    val top = t.read().filter(col("v") > lit(99.5))
    assert(top.count() == 1, "v > 99.5 must still see v = 99.9")
    assert(scannedFiles(top) == 1, "and open only the tail file")

    // conservative outer bounds may open a boundary file for a fractional
    // probe, but never lose rows: exact count on a mid-range band
    val band = t.read().filter(col("v") >= lit(24.5) && col("v") < lit(50.5))
    assert(band.count() ==
      df.filter(col("v") >= lit(24.5) && col("v") < lit(50.5)).count())
  }

  test("string stats columns prune in binary UTF8 order alongside numeric ones") {
    val root = Files.createTempDirectory("graft_skip7").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    // cluster by the STRING key: each file spans ~one segment
    cust.repartitionByRange(5, col("c_mktsegment"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_mktsegment", "c_custkey"))

    val total = scannedFiles(t.read())
    val seg = t.read().filter(col("c_mktsegment") === "BUILDING")
    assert(scannedFiles(seg) < total,
      "string point query must prune to the segment's file(s)")
    assert(seg.count() ==
      cust.filter(col("c_mktsegment") === "BUILDING").count())

    // range predicate on the string key, and an impossible probe
    val tail = t.read().filter(col("c_mktsegment") > "MACHINERY")
    assert(scannedFiles(tail) < total)
    assert(tail.count() == cust.filter(col("c_mktsegment") > "MACHINERY").count())
    val none = t.read().filter(col("c_mktsegment") === "zzz_no_such_segment")
    assert(scannedFiles(none) == 0, "impossible string probe must open nothing")

    // the numeric column's stats still exist but are full-range per file
    // (keys uncorrelated with segments): counts stay exact either way
    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    val point = t.read().filter(col("c_custkey") === k)
    assert(point.count() == cust.filter(col("c_custkey") === k).count())

    // mixed-type stats survive compaction CORRECTLY: the rewrite
    // range-clusters on the sorted stats columns (numeric key first
    // here), so the string stats may go full-range-wide — selectivity can
    // drop, but pruning must never lose rows
    t.compact(cust.count() / 3 + 1)
    val seg2 = t.read().filter(col("c_mktsegment") === "BUILDING")
    assert(seg2.count() ==
      cust.filter(col("c_mktsegment") === "BUILDING").count())
    val k2 = cust.agg(max(col("c_custkey"))).head().getLong(0)
    val point2 = t.read().filter(col("c_custkey") === k2)
    assert(scannedFiles(point2) < scannedFiles(t.read()),
      "post-compaction clustering is on the numeric key — it must prune")
    assert(point2.count() == cust.filter(col("c_custkey") === k2).count())
  }

  test("files() metadata view exposes the per-file skipping bounds") {
    val root = Files.createTempDirectory("graft_skip10").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    cust.repartitionByRange(4, col("c_custkey")).write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_custkey"))
    val files = t.files().collect()
    assert(files.length == 4)
    assert(files.forall(_.getLong(1) > 0), "sizes must be recorded")
    val bounds = files.map { r =>
      val m = r.getMap[String, org.apache.spark.sql.Row](2)
      val b = m("c_custkey")
      (b.getLong(0), b.getLong(1)) // lo, hi
    }
    // range-clustered ingest → per-file ranges are disjoint and ordered,
    // covering the table's min/max
    assert(bounds.sliding(2).forall { case Array((_, h1), (l2, _)) => h1 <= l2 })
    assert(bounds.head._1 == cust.agg(min(col("c_custkey"))).head().getLong(0))
    assert(bounds.last._2 == cust.agg(max(col("c_custkey"))).head().getLong(0))
  }

  test("null-count stats prune IS NULL / IS NOT NULL and all-null value probes") {
    val root = Files.createTempDirectory("graft_skip9").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    // v is entirely null in the first half of the id range: clustering by
    // id gives 2 all-null files and 2 fully-populated ones
    val df = spark.range(0, 100)
      .select(col("id"), when(col("id") >= 50, col("id")).as("v"))
    df.repartitionByRange(4, col("id")).write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("id", "v"))
    assert(scannedFiles(t.read()) == 4)

    val notNull = t.read().filter(col("v").isNotNull)
    assert(scannedFiles(notNull) == 2, "all-null files must prune for IS NOT NULL")
    assert(notNull.count() == 50)

    val isNull = t.read().filter(col("v").isNull)
    assert(scannedFiles(isNull) == 2, "zero-null files must prune for IS NULL")
    assert(isNull.count() == 50)

    // a value probe in the all-null half: bounds don't exist there, but
    // the null accounting still prunes those files — and the populated
    // files' bounds exclude the value too, so NOTHING opens
    val impossible = t.read().filter(col("v") === 10L)
    assert(scannedFiles(impossible) == 0,
      "all-null + bounds pruning must compose to zero files")
    assert(impossible.count() == 0)

    val hit = t.read().filter(col("v") === 60L)
    assert(scannedFiles(hit) == 1)
    assert(hit.count() == 1)
  }

  test("z-order compaction keeps BOTH numeric columns prunable") {
    val root = Files.createTempDirectory("graft_skip8").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    cust.repartitionByRange(8, col("c_custkey"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_custkey", "c_acctbal"))
    t.compact(cust.count() / 16 + 1, zOrder = true)

    val total = scannedFiles(t.read())
    assert(total >= 8, s"expected a multi-file z-ordered layout, got $total")
    // point query on the FIRST dimension prunes
    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    val byKey = t.read().filter(col("c_custkey") === k)
    assert(scannedFiles(byKey) < total, "z-order lost custkey selectivity")
    assert(byKey.count() == cust.filter(col("c_custkey") === k).count())
    // range query on the SECOND dimension ALSO prunes — the property
    // lexicographic range clustering cannot give (its second key is
    // full-range in every file)
    val hiBal = cust.agg(max(col("c_acctbal"))).head().getDouble(0)
    val band = t.read().filter(col("c_acctbal") > lit(hiBal * 0.9))
    assert(scannedFiles(band) < total, "z-order lost acctbal selectivity")
    assert(band.count() == cust.filter(col("c_acctbal") > lit(hiBal * 0.9)).count())
  }

  test("ZORDER BY names the interleave columns (SQL verb); un-analyzed " +
      "or non-numeric columns refuse") {
    val root = Files.createTempDirectory("graft_skip_zby").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
    cust.repartitionByRange(8, col("c_custkey"))
      .write.parquet(s"$root/landing")
    // stats recorded for three numerics: the AUTO pick would interleave
    // (c_custkey, c_nationkey); BY names (c_custkey, c_acctbal) instead
    t.ingest(s"$root/landing",
      statsCols = Seq("c_custkey", "c_nationkey", "c_acctbal"))
    t.bindSql("zby_t")
    // the SQL verb parses BY and routes the column list (its 1M-row
    // default target packs this small table into one file, so the
    // multi-file layout assertion below re-compacts through the API
    // with a test-sized target)
    t.sql(s"OPTIMIZE zby_t ZORDER BY (c_custkey, c_acctbal)")
    t.compact(cust.count() / 16 + 1,
      zOrderBy = Seq("c_custkey", "c_acctbal"))
    val total = scannedFiles(t.read())
    assert(total >= 8, s"expected a multi-file layout, got $total")
    val hiBal = cust.agg(max(col("c_acctbal"))).head().getDouble(0)
    val band = t.read().filter(col("c_acctbal") > lit(hiBal * 0.9))
    assert(scannedFiles(band) < total,
      "named second z-column must stay prunable")
    assert(band.count()
      == cust.filter(col("c_acctbal") > lit(hiBal * 0.9)).count())
    // refusals: no recorded stats (the ANALYZE-first contract), wrong
    // type, wrong arity
    val e1 = intercept[Exception] {
      t.sql("OPTIMIZE zby_t ZORDER BY (c_custkey, c_comment)")
    }
    assert(e1.getMessage.contains("ANALYZE"), e1.getMessage)
    val e2 = intercept[Exception] {
      t.compact(1000, zOrderBy = Seq("c_custkey"))
    }
    assert(e2.getMessage.contains("exactly two"), e2.getMessage)
    graft.sources.GraftSql.unbind(spark, "zby_t")
  }

  test("files re-added after removal take size and stats from the winning add") {
    // regression for the liveActionsAt generation-mixing hazard: a path
    // removed and later re-added (with different content) must surface the
    // LATEST add's size/stats, not an independent max() across generations
    val root = Files.createTempDirectory("graft_skip6").toString
    val ledgerDir = s"$root/ledger"
    val ss = spark
    import ss.implicits._
    // generation 1: add the file with an INFLATED size and stats [0, 10];
    // gen 2: remove; gen 3: re-add with the REAL size and stats [100, 200].
    // An independent max() across generations would pick gen 1's bigger
    // size (breaking the scan's footer read) and would mix stats ranges.
    spark.range(0, 5).select(col("id").as("k")).coalesce(1)
      .write.parquet(s"$root/data")
    val f = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val (real, realLen) = (f.getAbsolutePath, f.length())
    def act(snap: Long, op: String, size: Long, lo: Long, hi: Long,
        withStats: Boolean) =
      (real, size, 0L, snap, new java.sql.Timestamp(snap * 1000), op, "append",
        if (withStats) Map("k" -> (lo, hi)) else null)
    Seq(act(1, "add", realLen + 1000, 0, 10, withStats = true),
      act(2, "remove", 0, 0, 0, withStats = false),
      act(3, "add", realLen, 100, 200, withStats = true))
      .toDF("path", "size", "adler32", "snapshot_id", "ingested_at", "op",
        "snapshot_op", "stats_raw")
      .withColumn("stats", when(col("stats_raw").isNotNull,
        map_from_entries(transform(map_entries(col("stats_raw")),
          e => struct(e("key").as("key"),
            struct(e("value")("_1").as("lo"), e("value")("_2").as("hi"),
              lit(null).cast("string").as("slo"),
              lit(null).cast("string").as("shi"))
              .as("value"))))))
      .drop("stats_raw")
      .write.parquet(ledgerDir)
    val t = GraftTable(spark, ledgerDir, s"$root/gen")
    // k=3 is inside the OLD stats range but outside the new [100, 200]:
    // with the winning-add stats the file prunes away; mixed-generation
    // stats (min of mins / max of maxs) would wrongly open it — and a
    // mixed SIZE (100 from gen 1) would corrupt scan splits
    val pruned = t.readAt(3).filter(col("k") === lit(3L))
    assert(scannedFiles(pruned) == 0,
      "re-added file must carry the latest add's stats")
    // an unpruned read proves the winning add's REAL length reached the
    // FileStatus — gen 1's inflated size would fail the footer read
    assert(t.readAt(3).count() == 5)
  }

  test("analyze backfills stats with zero data movement; consumers see nothing") {
    val root = Files.createTempDirectory("graft_skip7").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    cust.repartitionByRange(8, col("c_custkey"))
      .write.parquet(s"$root/landing")
    // ingested WITHOUT stats: nothing can skip
    t.ingest(s"$root/landing")
    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    assert(scannedFiles(t.read().filter(col("c_custkey") === k)) == 8)
    val preSnap = t.snapshot
    val dataFiles = new java.io.File(s"$root/landing").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length())

    assert(t.analyze(Seq("c_custkey")) == 8)
    // the SAME files at the same paths — no data moved or rewritten
    val after = new java.io.File(s"$root/landing").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length())
    assert(after.sorted.sameElements(dataFiles.sorted))
    // now the point query prunes, with identical results
    assert(scannedFiles(t.read().filter(col("c_custkey") === k)) == 1)
    assert(t.read().count() == cust.count())
    // restat is NOT row-changing: incremental consumers see nothing new
    assert(Lake.readSince(spark, s"$root/ledger", preSnap).count() == 0)
    // idempotent: nothing deficient on the second pass, no new snapshot
    val s1 = t.snapshot
    assert(t.analyze(Seq("c_custkey")) == 0)
    assert(t.snapshot == s1)
  }

  test("analyze preserves previously recorded columns on deficient files") {
    val root = Files.createTempDirectory("graft_skip8").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    cust.repartitionByRange(8, col("c_custkey"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_custkey"))
    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    assert(scannedFiles(t.read().filter(col("c_custkey") === k)) == 1)
    // backfill a NEW column: the fresh map must keep c_custkey bounds too
    assert(t.analyze(Seq("c_acctbal")) == 8)
    assert(scannedFiles(t.read().filter(col("c_custkey") === k)) == 1,
      "existing column's skipping must survive the backfill")
    val lo = cust.agg(floor(min(col("c_acctbal")))).head().getLong(0)
    val narrow = t.read().filter(col("c_acctbal") < lo + 1)
    assert(scannedFiles(narrow) < 8, "new column must prune after backfill")
    assert(narrow.count() == cust.filter(col("c_acctbal") < lo + 1).count())
  }

  test("skipping survives COW merge and delete without re-analyze") {
    val root = Files.createTempDirectory("graft_skip_merge").toString
    val t = GraftTable(spark, s"$root/ledger", s"$root/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    cust.repartitionByRange(8, col("c_custkey"))
      .write.parquet(s"$root/landing")
    t.ingest(s"$root/landing", statsCols = Seq("c_custkey"),
      bloomCols = Seq("c_mktsegment"))
    val k = cust.agg(min(col("c_custkey"))).head().getLong(0)
    assert(scannedFiles(t.read().filter(col("c_custkey") === k)) == 1)

    // a merge touching ONE key range rewrites that file; the rewritten
    // carry + delta files must carry fresh stats — pruning intact with
    // NO analyze() in between
    t.merge(cust.filter(col("c_custkey") === k)
      .withColumn("c_acctbal", col("c_acctbal") + 1), "c_custkey")
    val nAfterMerge = scannedFiles(t.read().filter(col("c_custkey") === k))
    assert(nAfterMerge <= 2, // carry + delta of the one affected range
      s"point query opened $nAfterMerge files after merge — stats dropped")
    assert(t.files().filter(col("stats").isNull).count() == 0,
      "every live file must carry stats after the merge")
    // the bloom column's contract survives too (bloom non-null on rewrites)
    val bloomless = t.files()
      .filter(not(map_contains_key(col("stats"), lit("c_mktsegment"))))
    assert(bloomless.count() == 0, "bloom contract lost on rewrite")

    // DELETE a narrow slice: the surviving-row rewrite re-stats as well
    t.delete(col("c_custkey") === k + 1)
    val nAfterDelete = scannedFiles(t.read().filter(col("c_custkey") === k))
    assert(nAfterDelete <= 2,
      s"point query opened $nAfterDelete files after delete — stats dropped")
    assert(t.files().filter(col("stats").isNull).count() == 0,
      "every live file must carry stats after the delete")
    // correctness untouched
    assert(t.read().count() == cust.count() - 1)
  }
}
