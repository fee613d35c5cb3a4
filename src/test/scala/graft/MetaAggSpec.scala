package graft

import graft.sources.{GraftTable, Lake}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Manifest-only aggregates (Lake.statsCount): `count(*)` answered from
  * ledger stats + DV sidecars with ZERO data-file reads — exact across
  * the whole write lifecycle, proven by physically stashing the data
  * files away before asking. */
class MetaAggSpec extends GraftSpec {

  test("statsCount equals read().count() across append / COW merge / " +
      "MOR delete / COW delete / restore, per snapshot, and still " +
      "answers with every data file stashed away") {
    val tmp = Files.createTempDirectory("graft_metaagg").toString
    val t = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    cust.repartition(4).write.parquet(s"$tmp/landing")
    t.ingest(s"$tmp/landing", statsCols = Seq("c_custkey"))
    assert(t.statsCount() == Some(t.read().count()))

    // COW merge (update + insert): rewrites re-stat
    t.merge(cust.limit(30).withColumn("c_acctbal", col("c_acctbal") + 1)
      .unionByName(cust.limit(10)
        .withColumn("c_custkey", col("c_custkey") + 7000000)), "c_custkey")
    assert(t.statsCount() == Some(t.read().count()))
    // MOR delete: untouched files, sidecar subtraction
    t.deleteMor(col("c_custkey") % 5 === 0)
    assert(t.statsCount() == Some(t.read().count()))
    // COW delete on the MOR state (materializes vectors on affected files)
    t.delete(col("c_custkey") % 7 === 1)
    assert(t.statsCount() == Some(t.read().count()))
    // every committed snapshot answers exactly (time travel)
    (1L to t.snapshot).foreach { s0 =>
      assert(t.statsCount(s0) == Some(t.readAt(s0).count()),
        s"statsCount diverged at snapshot $s0")
    }
    // restore: re-adds carry the winning add's stats
    val restored = Lake.restore(spark, t.ledgerDir, 2L)
    assert(restored > 2L)
    assert(t.statsCount() == Some(t.read().count()))

    // the zero-data-read proof: stash EVERY data file (landing + gen
    // carry/delta), keeping only the ledger and the KB-scale DV sidecars
    // (they ARE the metadata the subtraction reads) — the count must
    // still answer, and equal what the (now impossible) scan said
    val expected = t.statsCount().get
    val stash = new java.io.File(s"$tmp/stash"); stash.mkdirs()
    var moved = 0
    def stashData(f: java.io.File): Unit = {
      if (f.isDirectory) {
        if (f.getName == "dv") () // sidecars stay
        else Option(f.listFiles()).getOrElse(Array()).foreach(stashData)
      } else if (f.getName.endsWith(".parquet")) {
        assert(f.renameTo(new java.io.File(stash, s"f$moved.parquet")))
        moved += 1
      }
    }
    stashData(new java.io.File(s"$tmp/landing"))
    stashData(new java.io.File(s"$tmp/gen"))
    assert(moved > 0, "stash moved nothing — proof vacuous")
    assert(t.statsCount() == Some(expected),
      "statsCount touched data files (failed after stash)")
  }

  test("statsMinMax equals read().agg(min/max) across the lifecycle, " +
      "answers with data stashed away, and refuses on every inexact path") {
    val tmp = Files.createTempDirectory("graft_metamm").toString
    val t = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    cust.repartition(4).write.parquet(s"$tmp/landing")
    t.ingest(s"$tmp/landing",
      statsCols = Seq("c_custkey", "c_name", "c_acctbal"))

    def scanAgg(): (Long, Long, String, String, Long) = {
      val r = t.read().agg(min(col("c_custkey")), max(col("c_custkey")),
        min(col("c_name")), max(col("c_name")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))
    }
    def metaAgg(): Option[(Long, Long, String, String, Long)] =
      t.statsMinMax(Seq("c_custkey", "c_name")).map { df =>
        val r = df.head()
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
          r.getLong(4))
      }
    assert(metaAgg() == Some(scanAgg()), "post-ingest")

    // append inherits the stats contract; COW merge re-stats rewrites —
    // the new global max comes from the appended generation's stats
    t.append(cust.limit(10)
      .withColumn("c_custkey", col("c_custkey") + 9000000)
      .withColumn("c_name", concat(lit("zz_"), col("c_name"))))
    assert(metaAgg() == Some(scanAgg()), "post-append")
    t.merge(cust.limit(5).withColumn("c_acctbal", col("c_acctbal") + 1),
      "c_custkey")
    assert(metaAgg() == Some(scanAgg()), "post-merge")
    // COW delete of the current min key: the bound must MOVE
    val oldMin = scanAgg()._1
    t.delete(col("c_custkey") === oldMin)
    assert(metaAgg() == Some(scanAgg()), "post-delete (bound moved)")
    assert(metaAgg().get._1 != oldMin)
    // time travel: per-snapshot resolution
    (1L to t.snapshot).foreach { s0 =>
      val r = t.readAt(s0).agg(min(col("c_custkey")), max(col("c_custkey")),
        count(lit(1))).head()
      val m = t.statsMinMax(Seq("c_custkey"), s0)
      assert(m.isDefined, s"refused at snapshot $s0")
      assert(m.get.head() == org.apache.spark.sql.Row(
        r.getLong(0), r.getLong(1), r.getLong(2)),
        s"diverged at snapshot $s0")
    }

    // refusals — never guess:
    // (a) non-integral numeric: DECIMAL bounds are floor/ceil, inexact
    assert(t.statsMinMax(Seq("c_acctbal")).isEmpty, "decimal must refuse")
    // (b) servable-typed column without recorded stats
    assert(t.statsMinMax(Seq("c_mktsegment")).isEmpty,
      "statless col must refuse")
    // (b') column absent from the recorded schema
    assert(t.statsMinMax(Seq("no_such_col")).isEmpty)
    // (c) active deletion vectors: a MOR-deleted row may hold the bound
    val expected = metaAgg().get
    t.deleteMor(col("c_custkey") % 11 === 3)
    assert(t.statsMinMax(Seq("c_custkey", "c_name")).isEmpty,
      "active DVs must refuse")
    // materializing the vectors (COW pass over them) restores service
    t.delete(col("c_custkey") % 11 === 3)
    assert(metaAgg() == Some(scanAgg()), "post-DV-materialization")

    // the zero-data-read proof: stash EVERY data file; min/max must
    // still answer, equal to what the (now impossible) scan said
    val want = metaAgg().get
    assert(want != expected) // the MOR+COW delete really changed content
    val stash = new java.io.File(s"$tmp/stash"); stash.mkdirs()
    var moved = 0
    def stashData(f: java.io.File): Unit = {
      if (f.isDirectory) {
        if (f.getName == "dv") ()
        else Option(f.listFiles()).getOrElse(Array()).foreach(stashData)
      } else if (f.getName.endsWith(".parquet")) {
        assert(f.renameTo(new java.io.File(stash, s"f$moved.parquet")))
        moved += 1
      }
    }
    stashData(new java.io.File(s"$tmp/landing"))
    stashData(new java.io.File(s"$tmp/gen"))
    assert(moved > 0, "stash moved nothing — proof vacuous")
    assert(metaAgg() == Some(want),
      "statsMinMax touched data files (failed after stash)")
  }

  test("statsMinMax serves RENAMED columns with zero data reads: " +
      "pre-rename files resolve their stats key through the epoch's " +
      "physical name, post-rename writes re-stat under the new name, " +
      "and both contribute to the bounds") {
    val tmp = Files.createTempDirectory("graft_metamm_ren").toString
    val t = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    cust.repartition(4).write.parquet(s"$tmp/landing")
    t.ingest(s"$tmp/landing", statsCols = Seq("c_custkey", "c_name"))
    t.renameColumn("c_custkey", "cust_id")
    // post-rename generation: physical column name is cust_id; the
    // rename-translated stats contract must re-stat it (not drop it)
    t.append(cust.limit(10)
      .withColumnRenamed("c_custkey", "cust_id")
      .withColumn("cust_id", col("cust_id") + 9000000))
    val scan = t.read().agg(min(col("cust_id")), max(col("cust_id")),
      min(col("c_name")), max(col("c_name")), count(lit(1))).head()
    val meta = t.statsMinMax(Seq("cust_id", "c_name"))
    assert(meta.isDefined, "statsMinMax refused on a renamed column")
    assert(meta.get.head() == scan, s"meta ${meta.get.head()} != scan $scan")
    // the MIN comes from a PRE-rename file, the MAX from the POST-rename
    // append — both epochs really contribute
    assert(scan.getLong(1) > 9000000L && scan.getLong(0) < 9000000L)
    // zero-data-read proof (the suite's stash discipline)
    val stash = new java.io.File(s"$tmp/stash"); stash.mkdirs()
    var moved = 0
    def stashData(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array()).foreach(stashData)
      else if (f.getName.endsWith(".parquet")) {
        assert(f.renameTo(new java.io.File(stash, s"f$moved.parquet")))
        moved += 1
      }
    }
    stashData(new java.io.File(s"$tmp/landing"))
    stashData(new java.io.File(s"$tmp/gen"))
    assert(moved > 0, "stash moved nothing — proof vacuous")
    assert(t.statsMinMax(Seq("cust_id", "c_name")).map(_.head())
      == Some(scan), "renamed-column statsMinMax touched data files")
  }

  test("a statless live file makes statsCount refuse (None), never guess") {
    val tmp = Files.createTempDirectory("graft_metaagg_none").toString
    val t = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    spark.read.parquet(s"$sf/nation.parquet").write.parquet(s"$tmp/landing")
    t.ingest(s"$tmp/landing") // no statsCols: no nrows recorded
    assert(t.statsCount().isEmpty)
    // empty table answers 0
    val t2 = GraftTable(spark, s"$tmp/ledger2", s"$tmp/gen2")
    assert(t2.statsCount() == Some(0L))
  }
}
