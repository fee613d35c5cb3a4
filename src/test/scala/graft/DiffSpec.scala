package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Snapshot diff (Lake.tableDiff): added/removed/changed classification
  * with pre/post images, computed from table STATE (no CDC feed
  * required), file-pruned to the write waves' blast radius — stable
  * files (live in both snapshots, deletion-vector state unchanged in the
  * window) are dropped from BOTH scans before the join.
  */
class DiffSpec extends GraftSpec {

  private def fresh(): (String, String, String) = {
    val t = Files.createTempDirectory("graft_diff_spec").toString
    (s"$t/landing", s"$t/ledger", s"$t/gen")
  }

  private def land(landing: String, ledger: String): Long = {
    spark.read.parquet(s"$sf/customer.parquet")
      .repartition(8).write.mode("append").parquet(landing)
    Lake.ingestNewFiles(spark, landing, ledger)
    Lake.currentSnapshot(spark, ledger)
  }

  test("self-diff is empty; a COW merge wave classifies exactly") {
    val (landing, ledger, gen) = fresh()
    val base = land(landing, ledger)
    assert(Lake.tableDiff(spark, ledger, base, base, "c_custkey").isEmpty)
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val updates = cust.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 1000)
    val inserts = cust.filter(col("c_custkey") % 97 === 0)
      .withColumn("c_custkey", col("c_custkey") + 10000000)
    val snap = Lake.mergeInto(spark, ledger, gen,
      updates.unionByName(inserts), "c_custkey",
      deleteWhen = Some(col("c_mktsegment") === "MACHINERY"))
    val got = Lake.tableDiff(spark, ledger, base, snap, "c_custkey")
      .select(col("c_custkey"), col("change"),
        col("pre.c_acctbal").as("preb"), col("post.c_acctbal").as("postb"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val rows = cust.select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want =
      rows.filter(_._1 % 97 == 0).map(r => (r._1 + 10000000, "added")) ++
      rows.filter(r => r._1 % 7 == 0 && r._2 == "MACHINERY")
        .map(r => (r._1, "removed")) ++
      rows.filter(r => r._1 % 7 == 0 && r._2 != "MACHINERY")
        .map(r => (r._1, "changed"))
    assert(want.exists(_._2 == "added") && want.exists(_._2 == "removed")
      && want.exists(_._2 == "changed"))
    assert(got == want.toSet)
    // changed rows carry both images, exactly +1000 apart
    Lake.tableDiff(spark, ledger, base, snap, "c_custkey")
      .filter(col("change") === "changed")
      .select(col("pre.c_acctbal"), col("post.c_acctbal"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(1) - r.getDouble(0) - 1000) < 1e-9)
      }
  }

  test("stable files are pruned: a one-key merge diffs its blast radius, " +
      "not the table") {
    val (landing, ledger, gen) = fresh()
    val base = land(landing, ledger)
    val nFiles = Lake.filesAt(spark, ledger, base).count()
    assert(nFiles >= 8)
    val one = spark.read.parquet(s"$sf/customer.parquet")
      .orderBy("c_custkey").limit(1)
      .withColumn("c_acctbal", col("c_acctbal") + 5)
    val snap = Lake.mergeInto(spark, ledger, gen, one, "c_custkey")
    val diff = Lake.tableDiff(spark, ledger, base, snap, "c_custkey")
    val dataFiles = diff.inputFiles.filter(_.contains("graft_diff_spec")).toSet
    assert(dataFiles.size <= 4,
      s"diff read ${dataFiles.size} files of $nFiles — stable files not pruned")
    val got = diff.select(col("c_custkey"), col("change")).collect()
    assert(got.length == 1 && got.head.getString(1) == "changed")
  }

  test("MOR deletes between snapshots surface as removed — a dv-touched " +
      "shared file is NOT treated as stable") {
    val (landing, ledger, gen) = fresh()
    val base = land(landing, ledger)
    val snap = Lake.deleteWhereMor(spark, ledger, gen,
      col("c_custkey") % 5 === 0)
    val got = Lake.tableDiff(spark, ledger, base, snap, "c_custkey")
      .select(col("c_custkey"), col("change")).collect()
    val want = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") % 5 === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty)
    assert(got.forall(_.getString(1) == "removed"))
    assert(got.map(_.getLong(0)).toSet == want)
  }
}
