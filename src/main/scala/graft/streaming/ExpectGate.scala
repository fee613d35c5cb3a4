package graft.streaming

import graft.sources.Expectations
import graft.sources.Expectations.{ExpectReport, Expectation}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The STREAMING twin of [[Expectations.appendExpect]] — quality gates on
  * a live feed, each micro-batch gated and committed as one table
  * snapshot, violations quarantined with reasons (the DLT
  * expect-on-a-stream shape; the batch transform is the SAME code, so the
  * gated stream provably equals gating the data in batch).
  *
  * Exactly-once lives in batch-keyed generations + the ledger itself as
  * the applied-set (the MirrorLoop discipline adapted to an append-only
  * ledger): micro-batch N writes generation `batch-N`, and a replayed
  * batch first asks whether the ledger already references `batch-N`
  * files. Both crash windows heal:
  *   - crash BEFORE the ledger append → no `batch-N` paths ledgered; the
  *     replay overwrites the generation and ingests it once;
  *   - crash AFTER the ledger append (checkpoint not yet advanced) → the
  *     replay sees `batch-N` in the ledger and SKIPS — re-writing the
  *     directory would mint new file names and double-ingest.
  * The skip probe is a KB-scale read of the ledger itself, never of data.
  */
object ExpectGate {

  /** True when the ledger already references files of `genName` —
    * the marker that a replayed micro-batch must not re-ingest. */
  private def applied(spark: SparkSession, ledgerDir: String,
      genName: String): Boolean = {
    val dir = new java.io.File(ledgerDir)
    dir.isDirectory &&
      dir.listFiles().exists(f => f.getName.endsWith(".parquet") && f.length() > 0) &&
      !spark.read.parquet(ledgerDir)
        .filter(col("path").contains(s"/$genName/")).isEmpty
  }

  /** Gate ONE micro-batch (idempotent under replay). Public so the
    * exactly-once property is testable without driving a crash mid-query:
    * calling it twice with the same `batchId` ingests once. */
  def gateBatch(ledgerDir: String, genRoot: String,
      expectations: Seq[Expectation], onViolation: String,
      batch: DataFrame, batchId: Long): Option[ExpectReport] = {
    val spark = batch.sparkSession
    val genName = s"batch-$batchId"
    if (applied(spark, ledgerDir, genName)) None
    else Some(Expectations.appendExpect(spark, ledgerDir, genRoot, batch,
      expectations, onViolation, genName = Some(genName)))
  }

  /** The stream writer: every micro-batch through the gate. Caller sets
    * the checkpoint location and trigger before `.start()`. */
  def gateStream(stream: DataFrame, ledgerDir: String, genRoot: String,
      expectations: Seq[Expectation],
      onViolation: String = "quarantine")
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        gateBatch(ledgerDir, genRoot, expectations, onViolation,
          batch, batchId): Unit
    }
}
