package graft.streaming

import graft.operators.{SetSim, TextOps}
import graft.sources.Lake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The production incremental-dedup loop the pieces were built for:
  * documents land as parquet files (the reference's dropbox pattern, cf.
  * file_transfer_scripts/createMetadatafiles_iceberg_dropbox.sh), each
  * ingest round appends a ledger snapshot, and exactly the newly-ingested
  * rows are deduped against the PRE-ingest corpus — never history against
  * itself, never a re-dedup of rows a prior round already decided.
  * Decisions (doc_id, dup_of) append to a decisions table.
  *
  * Exactly-once lives in the LEDGER, not in stream offsets: ingest
  * anti-joins the landing dir against already-recorded paths, so a
  * re-delivered or re-observed file is a no-op, and a crash between ingest
  * and decision append re-runs a deterministic dedup of the same snapshot
  * (append of identical rows — dedupe-able downstream by snapshot).
  *
  * At 100 TB each round's cost is |new batch| × (prefix-filtered history
  * candidates) — the R-S prefix join of SetSim.dedupNewVsHistory, with
  * both sides rep-collapsed and hot tokens salted; the new batch never
  * cross-joins history.
  */
object DedupLoop {

  /** Tokenize a documents frame into the (doc_id, toks, side) shape the
    * dedup core consumes. */
  private def sided(docs: DataFrame, side: String): DataFrame =
    docs.select(col("doc_id"),
        array_sort(array_distinct(TextOps.tokens(col("text")))).as("toks"))
      .withColumn("side", lit(side))

  /** One round: ingest any new files from `landingDir` into the ledger,
    * dedup exactly the newly-ingested rows against the pre-ingest corpus,
    * append decisions. Returns the number of files ingested (0 = no-op:
    * nothing new landed, nothing deduped, nothing written). */
  def ingestAndDedup(spark: SparkSession, landingDir: String,
      ledgerDir: String, decisionsDir: String): Long = {
    val before = Lake.currentSnapshot(spark, ledgerDir)
    val n = Lake.ingestNewFiles(spark, landingDir, ledgerDir)
    if (n == 0L) return 0L
    val newDocs = Lake.readSince(spark, ledgerDir, before)
    val hist = Lake.readAt(spark, ledgerDir, before)
    SetSim.dedupNewVsHistory(
        sided(hist, "h").unionByName(sided(newDocs, "n")))
      .write.mode("append").parquet(decisionsDir)
    n
  }

  /** The streaming form: a file stream watches the landing dir as the
    * ARRIVAL SIGNAL; each micro-batch fires one ingestAndDedup round. The
    * batch's own rows are deliberately unused — the ledger decides what is
    * new (its path anti-join makes re-fired or replayed batches no-ops),
    * which keeps the loop correct under checkpoint replay and restarts. */
  def dedupStream(spark: SparkSession, landingDir: String, ledgerDir: String,
      decisionsDir: String, checkpointDir: String,
      docSchema: org.apache.spark.sql.types.StructType): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "8")
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: DataFrame, _: Long) =>
        ingestAndDedup(spark, landingDir, ledgerDir, decisionsDir)
        ()
      }
      .start()
}
