package graft

import graft.sources.{Expectations, Lake}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Orphan gen-file GC (Lake.orphanFiles / removeOrphans): a REAL crashed
  * merge (source poisoned with raise_error, dying mid-gen-write after
  * its OCC reservation) leaves unledgered debris that the GC finds and
  * deletes; referenced files, quarantine partitions, and files younger
  * than the safety horizon are exempt; table state is untouched and the
  * lifecycle continues.
  */
class GcSpec extends GraftSpec {

  private def fresh(): (String, String, String) = {
    val t = Files.createTempDirectory("graft_gc_spec").toString
    (s"$t/landing", s"$t/ledger", s"$t/gen")
  }

  test("crashed merge leaves debris; GC collects exactly it") {
    val (landing, ledger, gen) = fresh()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    cust.repartition(4).write.parquet(landing)
    Lake.ingestNewFiles(spark, landing, ledger)
    val head = Lake.currentSnapshot(spark, ledger)
    // a real committed merge first — its gen files are REFERENCED
    val good = Lake.mergeInto(spark, ledger, gen,
      cust.limit(5).withColumn("c_acctbal", col("c_acctbal") + 1),
      "c_custkey")
    val before = Lake.readAt(spark, ledger, good)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    // quarantined rows are deliberate unledgered data — exempt
    Expectations.appendExpect(spark, ledger, gen,
      cust.limit(50).withColumn("c_acctbal", col("c_acctbal") - 1e9),
      Seq(Expectations.Expectation("bal_sane", col("c_acctbal") >= -1e6)))
    // the crash: a source that explodes only when a LATER row evaluates —
    // the merge reserves, starts writing gen files, and dies mid-write
    val poisoned = cust.limit(2000)
      .withColumn("c_name", when(col("c_custkey") % 1997 === 0,
        raise_error(lit("disk on fire"))).otherwise(col("c_name")))
    intercept[Throwable] {
      Lake.mergeInto(spark, ledger, gen, poisoned, "c_custkey")
    }
    // OCC auto-released the id (no orphaned commit) but files may remain;
    // plant one more stray to guarantee debris exists deterministically
    val stray = new java.io.File(s"$gen/gen-99/part-stray.parquet")
    stray.getParentFile.mkdirs()
    java.nio.file.Files.write(stray.toPath, Array[Byte](1, 2, 3))
    assert(Lake.orphanedCommits(spark, ledger).isEmpty)

    val orphans = Lake.orphanFiles(spark, ledger, gen, olderThanMs = 0)
    assert(orphans.exists(_.endsWith("part-stray.parquet")))
    // exemptions: nothing referenced, nothing quarantined
    val referenced = spark.read.option("mergeSchema", "true").parquet(ledger)
      .select("path").collect()
      .map(r => r.getString(0).replaceFirst("^file:/+", "/")).toSet
    assert(orphans.forall(p => !referenced.contains(p)))
    assert(!orphans.exists(_.contains("graft_expect=bal_sane")))
    // safety horizon: everything here is fresh — a 1 h horizon sees none
    assert(Lake.orphanFiles(spark, ledger, gen, olderThanMs = 3600000L).isEmpty)

    val removed = Lake.removeOrphans(spark, ledger, gen, olderThanMs = 0)
    assert(removed.toSet == orphans.toSet)
    assert(!stray.exists())
    assert(Lake.orphanFiles(spark, ledger, gen, olderThanMs = 0).isEmpty)
    // table state untouched, quarantine still readable, lifecycle continues
    assert(Lake.readAt(spark, ledger, good)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == before)
    assert(Expectations.readQuarantine(spark, gen).count() > 0)
    val next = Lake.mergeInto(spark, ledger, gen,
      cust.limit(3).withColumn("c_acctbal", col("c_acctbal") + 2),
      "c_custkey")
    assert(next > good && Lake.currentSnapshot(spark, ledger) == next)
    assert(head == 1L)
  }
}
