package graft

import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Full lake-table lifecycle through the single-handle facade:
  * ingest → merge → delete → compact → expire, with time travel and
  * incremental reads holding at each step. */
class GraftTableSpec extends GraftSpec {

  test("lifecycle: ingest, merge, delete, compact, expire on one handle") {
    val t0 = Files.createTempDirectory("graft_table").toString
    val t = GraftTable(spark, s"$t0/ledger", s"$t0/gen")
    val cust = spark.read.parquet(s"$sf/customer.parquet")

    cust.repartitionByRange(4, col("c_custkey"))
      .write.parquet(s"$t0/landing")
    assert(t.ingest(s"$t0/landing") == 4)
    val n0 = t.read().count()
    assert(n0 == cust.count())
    val s1 = t.snapshot

    // merge with the change feed on: the feed carries the update images
    // and a mirror maintained from it equals the table
    val updates = cust.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 5)
    t.merge(updates, "c_custkey", changeFeed = true)
    assert(t.read().count() == n0)
    assert(t.readSince(s1).count() == updates.count())
    val ch = t.readChanges(s1)
    assert(ch.filter(col("_change_type") === "update_postimage").count()
      == updates.count())
    assert(t.applyChanges(t.readAt(s1), ch, "c_custkey")
        .orderBy(col("c_custkey")).collect().map(_.toSeq).toSeq
      == t.read().orderBy(col("c_custkey")).collect().map(_.toSeq).toSeq,
      "feed-maintained mirror diverged from the table")

    // delete a segment
    val nDel = t.read().filter(col("c_mktsegment") === "MACHINERY").count()
    t.delete(col("c_mktsegment") === "MACHINERY")
    assert(t.read().count() == n0 - nDel)

    // compact, then expire everything but the present
    val sC = t.compact(1000000)
    assert(t.read().count() == n0 - nDel)
    assert(t.readAt(s1).count() == n0, "time travel before expiry")
    val deleted = t.expire(t.snapshot)
    assert(deleted > 0)
    assert(t.read().count() == n0 - nDel, "present unaffected by expiry")
    assert(t.rowChangingSnapshots.nonEmpty)
    intercept[Exception] { t.readAt(s1).count() }
  }

  test("temp-view SQL surface: spark.sql over the lake, snapshot-pinned") {
    val t0 = Files.createTempDirectory("graft_table_sql").toString
    val t = GraftTable(spark, s"$t0/ledger", s"$t0/gen")
    spark.read.parquet(s"$sf/nation.parquet")
      .repartition(2).write.parquet(s"$t0/landing")
    t.ingest(s"$t0/landing")
    t.createOrReplaceTempView("occ_nations")
    val n = spark.sql("SELECT count(*) AS n FROM occ_nations")
      .head().getLong(0)
    assert(n == t.read().count())
    // snapshot-pinned: a later merge is invisible until re-registration
    t.merge(spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_nationkey") === 0).withColumn("n_name", lit("sqlv")),
      "n_nationkey")
    assert(spark.sql(
      "SELECT count(*) AS n FROM occ_nations WHERE n_name = 'sqlv'")
      .head().getLong(0) == 0, "registered view must stay snapshot-pinned")
    t.createOrReplaceTempView("occ_nations")
    assert(spark.sql(
      "SELECT count(*) AS n FROM occ_nations WHERE n_name = 'sqlv'")
      .head().getLong(0) == 1)
    spark.catalog.dropTempView("occ_nations")
  }

  test("concurrent-writer surface: withRetry rebase, orphans, release") {
    val t0 = Files.createTempDirectory("graft_table_occ").toString
    val t = GraftTable(spark, s"$t0/ledger", s"$t0/gen")
    spark.read.parquet(s"$sf/nation.parquet")
      .repartition(2).write.parquet(s"$t0/landing")
    t.ingest(s"$t0/landing")
    val s0 = t.snapshot
    // a foreign writer hard-crashed holding s0+1: visible, releasable
    graft.sources.Lake.commitStore
      .putIfAbsent(s"$t0/ledger/_commits", (s0 + 1).toString)
    assert(t.orphans() == Seq(s0 + 1))
    assert(!t.release(s0), "landed ids must refuse release")
    assert(t.release(s0 + 1))
    assert(t.orphans().isEmpty)
    // withRetry turns the collision into a rebase: reserve the next id
    // again, and let the retried op land past it after we free it on the
    // first collision (one-shot contention via the injectable store)
    graft.sources.Lake.commitStore
      .putIfAbsent(s"$t0/ledger/_commits", (s0 + 1).toString)
    var collisions = 0
    val landed = t.withRetry() {
      try t.merge(spark.read.parquet(s"$sf/nation.parquet")
          .filter(col("n_nationkey") === 0)
          .withColumn("n_name", lit("occ")), "n_nationkey")
      catch { case e: graft.sources.Lake.ConcurrentCommitException =>
        collisions += 1; t.release(e.snapshot); throw e
      }
    }
    assert(collisions == 1 && landed == s0 + 1)
    assert(t.read().filter(col("n_name") === "occ").count() == 1)
  }
}
