package graft

import graft.sources.{GraftTable, Lake}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Schema-in-manifest: the table schema recorded in the ledger
  * (`_schema/schema-<snapshot>.json`) replaces parquet footer inference
  * at plan time — ZERO footer-reading jobs planning an evolved table,
  * byte-identical results vs the footer path, snapshot-resolved schemas
  * under time travel / incremental reads / restore, and schema carry
  * through branch + publish. */
class SchemaManifestSpec extends GraftSpec {

  private def evolvedFixture(): (GraftTable, String, Long) = {
    val tmp = Files.createTempDirectory("graft_schema_spec").toString
    val tbl = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    spark.read.parquet(s"$sf/customer.parquet")
      .repartition(4).write.parquet(s"$tmp/landing")
    tbl.ingest(s"$tmp/landing")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val evolveSnap = tbl.merge(
      cust.limit(50).withColumn("c_tier", lit("GOLD")),
      "c_custkey", evolveSchema = true)
    (tbl, tmp, evolveSnap)
  }

  /** Count plan-time FOOTER-INFERENCE jobs (stage name points into the
    * parquet schema-merging machinery) — the ledger's own KB-scale
    * metadata jobs are expected and excluded. */
  private def countFooterJobs(body: => Unit): Int = {
    val counted = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = js.stageInfos.map(_.name).mkString(" ")
        // the inference job surfaces under its call site's name
        if (names.contains("mergeSchemasInParallel")
          || names.contains("parquetScan at"))
          counted.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try { body; org.apache.spark.sql.GraftShim.drainListenerBus(spark) }
    finally spark.sparkContext.removeSparkListener(listener)
    counted.get()
  }

  test("planning an evolved table launches ZERO footer-inference jobs " +
      "with the recording and at least one without it") {
    val (t, tmp, _) = evolvedFixture()
    // executedPlan forces full planning; no action runs
    val jobsRecorded = countFooterJobs {
      t.read().queryExecution.executedPlan: Unit
    }
    assert(jobsRecorded == 0,
      s"plan with recorded schema launched $jobsRecorded footer job(s)")
    // control: hide the recording -> the evolved table pays the
    // merged-footer inference job at plan time
    val hidden = new java.io.File(s"$tmp/_schema_stash")
    assert(new java.io.File(s"$tmp/ledger/_schema").renameTo(hidden))
    val jobsFooter = countFooterJobs {
      t.read().queryExecution.executedPlan: Unit
    }
    assert(jobsFooter > 0, "control failed: footer path launched no " +
      "footer job (the zero-jobs assertion above would be vacuous)")
    assert(hidden.renameTo(new java.io.File(s"$tmp/ledger/_schema")))
  }

  test("recorded-schema reads are byte-identical to the footer path, " +
      "and time travel resolves the snapshot's schema") {
    val (t, tmp, evolveSnap) = evolvedFixture()
    val withRec = t.read().orderBy("c_custkey").collect()
    val schemaRec = t.read().schema
    // footer path (recording hidden)
    val hidden = new java.io.File(s"$tmp/_schema_stash")
    assert(new java.io.File(s"$tmp/ledger/_schema").renameTo(hidden))
    val withFooter = t.read().orderBy("c_custkey").collect()
    val schemaFooter = t.read().schema
    assert(hidden.renameTo(new java.io.File(s"$tmp/ledger/_schema")))
    assert(schemaRec.fields.map(f => (f.name, f.dataType)).toSeq ==
      schemaFooter.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema diverged: $schemaRec vs $schemaFooter")
    assert(withRec.sameElements(withFooter), "rows diverged vs footer path")
    // time travel below the evolution sees the pre-evolution shape
    assert(!t.readAt(evolveSnap - 1).columns.contains("c_tier"))
    assert(t.readAt(evolveSnap).columns.contains("c_tier"))
    // incremental units resolve per-snapshot schemas the same way
    assert(!t.readSnapshot(1).columns.contains("c_tier"))
    assert(t.readSnapshot(evolveSnap).columns.contains("c_tier"))
    assert(t.readSnapshot(evolveSnap)
      .filter(col("c_tier") === "GOLD").count() == 50)
  }

  test("restore over a schema evolution rolls the read schema back") {
    val (t, _, evolveSnap) = evolvedFixture()
    val restored = Lake.restore(spark, t.ledgerDir, evolveSnap - 1)
    assert(restored > evolveSnap)
    assert(!t.read().columns.contains("c_tier"),
      "restored read must resolve the restored state's schema")
    // history above the restore still time-travels to the evolved shape
    assert(t.readAt(evolveSnap).columns.contains("c_tier"))
  }

  test("branch resolves the fork's schema; a branch-staged evolution " +
      "publishes to main with its snapshot") {
    val tmp = Files.createTempDirectory("graft_schema_branch").toString
    val tbl = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    spark.read.parquet(s"$sf/customer.parquet")
      .repartition(4).write.parquet(s"$tmp/landing")
    tbl.ingest(s"$tmp/landing")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    // stage the evolution ON THE BRANCH
    val branchDir = s"$tmp/branch"
    tbl.branch(branchDir)
    Lake.mergeInto(spark, branchDir, s"$tmp/bgen",
      cust.limit(20).withColumn("c_tier", lit("WAP")), "c_custkey",
      evolveSchema = true)
    assert(Lake.readAt(spark, branchDir,
      Lake.currentSnapshot(spark, branchDir)).columns.contains("c_tier"))
    // main untouched until publish
    assert(!tbl.read().columns.contains("c_tier"))
    assert(Lake.publish(spark, branchDir).nonEmpty)
    assert(tbl.read().columns.contains("c_tier"))
    assert(tbl.read().filter(col("c_tier") === "WAP").count() == 20)
    // and the published evolution is snapshot-resolved on main too
    assert(!tbl.readAt(1).columns.contains("c_tier"))
  }
}
