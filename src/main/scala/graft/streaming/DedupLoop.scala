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
  * re-delivered or re-observed file is a no-op. Decision progress is
  * tracked per SNAPSHOT in a `_progress` sidecar: every round processes
  * all still-undecided snapshots oldest-first, so a crash between ingest
  * and decision append heals on the next round, and a crash between the
  * decisions append and its marker at worst re-appends that snapshot's
  * deterministic decisions (read back with DISTINCT via `decisions()`).
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

  /** Snapshot ids already decided, from the `_progress` sidecar (a
    * directory Spark's file index ignores when reading the decisions
    * table itself). */
  private def decidedSnapshots(spark: SparkSession, decisionsDir: String): Set[Long] = {
    val dir = new java.io.File(s"$decisionsDir/_progress")
    if (!dir.isDirectory) return Set.empty
    spark.read.parquet(dir.getPath)
      .select(col("snapshot_id")).collect().map(_.getLong(0)).toSet
  }

  /** One round: ingest any new files from `landingDir` into the ledger,
    * then dedup EVERY not-yet-decided row-changing snapshot, oldest
    * first, against the corpus as of just before it — so a crash between
    * ingest and decision append is healed by the next round (the pending
    * snapshot is simply still undecided), not silently skipped. Each
    * snapshot's decisions are deterministic, so a crash between the
    * decisions append and the progress marker at worst re-appends
    * identical rows — `decisions()` reads with DISTINCT. Returns the
    * number of files ingested this round. */
  def ingestAndDedup(spark: SparkSession, landingDir: String,
      ledgerDir: String, decisionsDir: String): Long = {
    val n = Lake.ingestNewFiles(spark, landingDir, ledgerDir)
    val decided = decidedSnapshots(spark, decisionsDir)
    val pending = Lake.rowChangingSnapshots(spark, ledgerDir)
      .filterNot(decided)
    pending.foreach { s =>
      val newDocs = Lake.readSnapshot(spark, ledgerDir, s)
      val hist = Lake.readAt(spark, ledgerDir, s - 1)
      SetSim.dedupNewVsHistory(
          sided(hist, "h").unionByName(sided(newDocs, "n")))
        .withColumn("snapshot_id", lit(s))
        .write.mode("append").parquet(decisionsDir)
      // marker AFTER the decisions land (see scaladoc for the crash story)
      import spark.implicits._
      Seq(s).toDF("snapshot_id")
        .write.mode("append").parquet(s"$decisionsDir/_progress")
    }
    n
  }

  /** The decisions table: (doc_id, dup_of, snapshot_id), deduplicated —
    * a crash-window re-run may have appended a snapshot's deterministic
    * decisions twice. */
  def decisions(spark: SparkSession, decisionsDir: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(decisionsDir).distinct()

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
