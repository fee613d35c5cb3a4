package graft

import graft.sources.{Expectations, Lake}
import graft.sources.Expectations.Expectation
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ExpectationsSpec extends GraftSpec {

  private def fresh(): (String, String) =
    (Files.createTempDirectory("graft_exp_gen").toString,
      Files.createTempDirectory("graft_exp_ledger").toString + "/ledger")

  // 2 clean rows, 1 negative qty, 1 null name, 1 violating both
  private def batch() = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("qty", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a", 10L), Row(2L, "b", 0L),
        Row(3L, "c", -5L), Row(4L, null, 7L), Row(5L, null, -1L)), 2),
      schema)
  }

  private val exps = Seq(
    Expectation("qty_nonneg", col("qty") >= 0),
    Expectation("name_not_null", col("name").isNotNull))

  test("quarantine mode: clean rows commit, violations divert with reasons") {
    val (gen, ledger) = fresh()
    val r = Expectations.appendExpect(spark, ledger, gen, batch(), exps)
    assert(r.passed == 2 && r.quarantined == 3)
    assert(r.byExpectation == Map("qty_nonneg" -> 2, "name_not_null" -> 2))
    assert(r.snapshot == Lake.currentSnapshot(spark, ledger))
    val table = Lake.readAt(spark, ledger, r.snapshot)
    assert(table.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // table schema is EXACTLY the input schema — no expectations column
    assert(table.columns.sorted.toSeq == Seq("id", "name", "qty"))
    val q = Expectations.readQuarantine(spark, gen)
      .select(col("id"), col(Expectations.PartCol)).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(q == Map(
      3L -> "qty_nonneg",
      4L -> "name_not_null",
      5L -> "name_not_null,qty_nonneg")) // sorted violation set
  }

  test("null predicate result counts as a violation") {
    val (gen, ledger) = fresh()
    val rows = batch().withColumn("qty",
      when(col("id") === 1L, lit(null).cast("long")).otherwise(col("qty")))
    val r = Expectations.appendExpect(spark, ledger, gen, rows, exps)
    // row 1's qty >= 0 is NULL -> violation; only row 2 passes
    assert(r.passed == 1 && r.quarantined == 4)
    val q = Expectations.readQuarantine(spark, gen)
      .filter(col("id") === 1L).select(Expectations.PartCol)
      .head().getString(0)
    assert(q == "qty_nonneg")
  }

  test("fail mode aborts all-or-nothing; ledger untouched") {
    val (gen, ledger) = fresh()
    val before = Lake.currentSnapshot(spark, ledger)
    val e = intercept[IllegalStateException] {
      Expectations.appendExpect(spark, ledger, gen, batch(), exps,
        onViolation = "fail")
    }
    assert(e.getMessage.contains("name_not_null=2")
      && e.getMessage.contains("qty_nonneg=2"))
    assert(Lake.currentSnapshot(spark, ledger) == before)
    assert(!new java.io.File(s"$gen/gen-${before + 1}").exists(),
      "aborted generation must be deleted")
  }

  test("fail mode commits when everything passes") {
    val (gen, ledger) = fresh()
    val clean = batch().filter(col("id").isin(1L, 2L))
    val r = Expectations.appendExpect(spark, ledger, gen, clean, exps,
      onViolation = "fail")
    assert(r.passed == 2 && r.quarantined == 0 && r.snapshot == 1L)
  }

  test("drop mode discards violations; nothing quarantined on disk") {
    val (gen, ledger) = fresh()
    val r = Expectations.appendExpect(spark, ledger, gen, batch(), exps,
      onViolation = "drop")
    assert(r.passed == 2 && r.quarantined == 3)
    val dirs = new java.io.File(s"$gen/gen-1").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs == Seq(s"${Expectations.PartCol}=${Expectations.PartOk}"))
  }

  test("facade: appendExpect + quarantine on a GraftTable handle") {
    val t0 = Files.createTempDirectory("graft_exp_table").toString
    val t = graft.sources.GraftTable(spark, s"$t0/ledger", s"$t0/gen")
    val r = t.appendExpect(batch(), exps)
    assert(r.passed == 2 && r.quarantined == 3)
    assert(t.read().count() == 2)
    assert(t.quarantine().count() == 3)
  }

  test("streaming gate: micro-batches commit gated snapshots; replay is exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val (gen, ledger) = fresh()
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF().toDF("id", "name", "qty")
    val ckpt = Files.createTempDirectory("graft_exp_ckpt").toString
    val query = graft.streaming.ExpectGate
      .gateStream(stream, ledger, gen, exps)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, "a", 10L), (2L, "b", -3L))
      query.processAllAvailable()
      mem.addData((3L, null, 4L), (4L, "d", 1L))
      query.processAllAvailable()
    } finally query.stop()
    val table = Lake.readAt(spark, ledger, Lake.currentSnapshot(spark, ledger))
    assert(table.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    val q = Expectations.readQuarantine(spark, gen)
      .select(col("id"), col(Expectations.PartCol)).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(q == Map(2L -> "qty_nonneg", 3L -> "name_not_null"))
    // replaying an ALREADY-LEDGERED batch must not double-ingest: the
    // crash-after-commit window (checkpoint behind the ledger)
    val replay = batch().filter(col("id") === 1L)
      .select(col("id"), col("name"), col("qty"))
    val r = graft.streaming.ExpectGate.gateBatch(ledger, gen, exps,
      "quarantine", replay, batchId = 0L)
    assert(r.isEmpty, "replayed batch must be skipped")
    assert(Lake.readAt(spark, ledger, Lake.currentSnapshot(spark, ledger))
      .count() == 2)
    // a NEW batch id still commits (the probe keys on the batch, not data)
    val r2 = graft.streaming.ExpectGate.gateBatch(ledger, gen, exps,
      "quarantine", replay.withColumn("id", col("id") + 100L), 7L)
    assert(r2.exists(_.passed == 1))
  }

  test("successive gated appends accumulate snapshots and rows") {
    val (gen, ledger) = fresh()
    val r1 = Expectations.appendExpect(spark, ledger, gen, batch(), exps)
    val more = batch().withColumn("id", col("id") + 10L)
    val r2 = Expectations.appendExpect(spark, ledger, gen, more, exps)
    assert(r2.snapshot > r1.snapshot)
    val ids = Lake.readAt(spark, ledger, r2.snapshot)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 11L, 12L))
    // quarantine keeps BOTH generations' diverted rows
    assert(Expectations.readQuarantine(spark, gen).count() == 6)
  }
}
