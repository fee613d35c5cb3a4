package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout writers — the storage discipline side of the engine
  * (the reference's file mover lands run data + metadata sidecars into a
  * dropbox tree, cf. file_transfer_scripts/createMetadatafiles_iceberg_dropbox.sh;
  * a Spark lake expresses the same as partitioned parquet + manifest
  * columns).
  *
  * At 100 TB the partition layout IS the index: date/hour partitioning means
  * time-range queries prune at the directory level before any file is
  * opened, and per-partition file sizing keeps the scan parallelism sane.
  */
object Lake {

  /** Write events partitioned by event date and hour. Time-range predicates
    * then prune whole directories (partition pruning), the first line of
    * defense before row-group stats. */
  def writeEventsPartitioned(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("event_hour", hour(col("ts")))
      // one shuffle to co-locate each partition's rows into one task —
      // otherwise every task writes a file into every partition (file blowup)
      .repartition(col("event_date"), col("event_hour"))
      .write
      .partitionBy("event_date", "event_hour")
      .mode("overwrite")
      .parquet(outDir)

  /** Read back with partition pruning available. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Small-file compaction: rewrite a directory tree targeting
    * `targetRowsPerFile` (row-count proxy for a byte-size target; at scale
    * use maxRecordsPerFile + file stats from the manifest). */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetRowsPerFile: Long): Unit = {
    val df = spark.read.parquet(dir)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    df.repartition(files)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Manifest of a written tree: per-partition row counts + payload stats —
    * the metadata sidecar pattern (cf. insert_extra_fields.py writing
    * checksum+size JSON next to each data file). */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("event_date"), col("event_hour"))
      .agg(count(lit(1)).as("n_rows"),
        sum(graft.functions.GraftFunctions.adler32(col("props").cast("binary")))
          .as("payload_adler_sum"))

  // ------------------------------------------------------------ ingest ledger

  /** Idempotent file-ingest ledger — the exactly-once bookkeeping of the
    * reference's dropbox mover (createMetadatafiles_iceberg_dropbox.sh:
    * scan dropbox → skip already-processed → record checksum sidecar),
    * re-expressed as a lake table with one row PER FILE ACTION:
    * (path, size, adler32, snapshot_id, ingested_at, op, snapshot_op).
    *
    * op is "add" | "remove"; snapshot_op tags the whole snapshot as
    * "append" (new data) or "replace" (a rewrite such as compaction that
    * changes files but not rows). Live files at snapshot S = adds ≤ S
    * minus removes ≤ S — which gives snapshot-pinned time travel (readAt)
    * and incremental consumption that skips rewrites (readSince), the two
    * Iceberg-isms expressible on plain parquet.
    *
    * Each ingest invocation scans the landing dir, anti-joins against the
    * ledger on path, and appends only the NEW files under the next
    * snapshot_id — so re-running ingest is a no-op (the lockfile/skip
    * semantics). Checksums are computed distributed (binaryFile source +
    * the codegen adler32 — matching the reference's zlib adler32, cf.
    * insert_extra_fields.py:24-29); only the KB-scale ledger delta touches
    * the driver. Returns the number of files ingested. */
  def ingestNewFiles(spark: SparkSession, landingDir: String,
      ledgerDir: String): Long = {
    val current = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(landingDir)
      .select(col("path"), col("length").as("size"),
        graft.functions.GraftFunctions.adler32(col("content")).as("adler32"))
    val (newFiles, nextSnapshot) = readLedger(spark, ledgerDir) match {
      case Some(ledger) =>
        val next = ledger.agg(max(col("snapshot_id"))).head().getLong(0) + 1
        (current.join(ledger.select(col("path")).distinct(),
          Seq("path"), "left_anti"), next)
      case None => (current, 1L)
    }
    val delta = newFiles
      .withColumn("snapshot_id", lit(nextSnapshot))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("op", lit("add"))
      .withColumn("snapshot_op", lit("append"))
      .localCheckpoint() // materialize BEFORE appending to the dir we read
    val n = delta.count()
    if (n > 0) delta.write.mode("append").parquet(ledgerDir)
    n
  }

  /** The ledger if it holds any data — decided from the presence of ledger
    * DATA files, not _SUCCESS: after a partially failed append the marker
    * may be missing while committed rows exist, and restarting snapshot
    * ids at 1 would re-ingest every path (breaking exactly-once). */
  private def readLedger(spark: SparkSession, ledgerDir: String): Option[DataFrame] = {
    val dir = new java.io.File(ledgerDir)
    val hasData = dir.isDirectory &&
      dir.listFiles().exists(f => f.getName.endsWith(".parquet") && f.length() > 0)
    if (hasData) Some(spark.read.parquet(ledgerDir)) else None
  }

  /** Highest snapshot id in the ledger (0 = empty ledger). */
  def currentSnapshot(spark: SparkSession, ledgerDir: String): Long =
    readLedger(spark, ledgerDir)
      .map(_.agg(max(col("snapshot_id"))).head().getLong(0))
      .getOrElse(0L)

  /** Paths live AT `snapshot`: added in some snapshot ≤ it and not removed
    * by any snapshot ≤ it. KB-scale driver list, like a manifest. */
  private def liveFilesAt(spark: SparkSession, ledgerDir: String,
      snapshot: Long): Seq[String] =
    readLedger(spark, ledgerDir).map { ledger =>
      ledger.filter(col("snapshot_id") <= snapshot)
        .groupBy(col("path"))
        .agg(max(when(col("op") === "remove", col("snapshot_id"))).as("rm"),
          max(when(col("op") === "add", col("snapshot_id"))).as("ad"))
        .filter(col("ad").isNotNull && (col("rm").isNull || col("rm") < col("ad")))
        .select(col("path")).collect().map(_.getString(0)).toSeq
    }.getOrElse(Seq.empty)

  /** Read the files of `paths`, or a zero-row frame CARRYING the schema of
    * `schemaFrom` paths when empty (an empty incremental batch must still
    * project the table's columns — callers select event columns and would
    * otherwise crash only in the empty case). */
  private def readPaths(spark: SparkSession, paths: Seq[String],
      schemaFrom: Seq[String]): DataFrame =
    if (paths.nonEmpty) spark.read.parquet(paths: _*)
    else if (schemaFrom.nonEmpty) spark.read.parquet(schemaFrom: _*).limit(0)
    else spark.emptyDataFrame

  /** Snapshot-pinned TIME-TRAVEL read: the table exactly as of `snapshot`,
    * stable under any later appends/compactions (rewrites never delete the
    * files an older snapshot references; a vacuum that does would bound
    * time travel, as in any table format). */
  def readAt(spark: SparkSession, ledgerDir: String, snapshot: Long): DataFrame = {
    val live = liveFilesAt(spark, ledgerDir, snapshot)
    val any = liveFilesAt(spark, ledgerDir, Long.MaxValue)
    readPaths(spark, live, any)
  }

  /** Manifest-based incremental read: the rows of every file ADDED by a
    * row-changing snapshot AFTER `sinceSnapshot` — the "what's new since my
    * last checkpoint" consumer pattern. "append" and "merge" snapshots are
    * row-changing (their added files' rows surface exactly once); rewrite
    * ("replace") snapshots are skipped: compaction changes files, not rows,
    * and must not double-feed incremental consumers. Returns a zero-row
    * frame with the table schema when nothing is new. */
  def readSince(spark: SparkSession, ledgerDir: String,
      sinceSnapshot: Long): DataFrame = {
    val ledger = readLedger(spark, ledgerDir).getOrElse(return spark.emptyDataFrame)
    val paths = ledger
      .filter(col("snapshot_id") > sinceSnapshot && col("op") === "add"
        && col("snapshot_op").isin("append", "merge"))
      .select(col("path")).collect().map(_.getString(0)).toSeq
    val all = ledger.filter(col("op") === "add")
      .select(col("path")).collect().map(_.getString(0)).toSeq
    readPaths(spark, paths, all)
  }

  /** Ledger-aware compaction: rewrite the CURRENT live file set into
    * ~targetRowsPerFile chunks under `compactDir/gen-<snapshot>`, recording
    * one "replace" snapshot that removes the old paths and adds the new
    * ones. Each compaction writes a FRESH generation directory: a
    * recurring compaction never overwrites the files it is reading (its
    * input is the previous generation), its adds never collide with the
    * paths it removes, and older snapshots keep their files for time
    * travel. Readers at older snapshots still see the original files;
    * readSince consumers skip the replace snapshot; re-running ingest over
    * the landing dir stays a no-op because the ingested paths remain in
    * the ledger (as removed rows — the anti-join keys on path existence). */
  def compactIngested(spark: SparkSession, ledgerDir: String,
      compactDir: String, targetRowsPerFile: Long): Long = {
    val snap = currentSnapshot(spark, ledgerDir)
    val live = liveFilesAt(spark, ledgerDir, snap)
    if (live.isEmpty) return 0L
    val next = snap + 1
    val genDir = s"$compactDir/gen-$next"
    val df = spark.read.parquet(live: _*)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    df.repartition(files).write.mode("overwrite").parquet(genDir)
    val added = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(genDir)
      .select(col("path"), col("length").as("size"),
        graft.functions.GraftFunctions.adler32(col("content")).as("adler32"))
      .withColumn("op", lit("add"))
    val removed = spark.createDataFrame(
        spark.sparkContext.parallelize(live.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("path",
            org.apache.spark.sql.types.StringType))))
      .withColumn("size", lit(null).cast("long"))
      .withColumn("adler32", lit(null).cast("long"))
      .withColumn("op", lit("remove"))
    added.unionByName(removed)
      .withColumn("snapshot_id", lit(next))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("snapshot_op", lit("replace"))
      .select(col("path"), col("size"), col("adler32"), col("snapshot_id"),
        col("ingested_at"), col("op"), col("snapshot_op"))
      .localCheckpoint()
      .write.mode("append").parquet(ledgerDir)
    next
  }

  /** Schema-evolution read: merge per-file schemas across generations
    * (added columns surface as nulls on old files) — the second
    * Iceberg-ism expressible on plain parquet. */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  // ------------------------------------------------------------- bucketing

  /** Bucketed managed-table write: hash-bucket (and sort) the table by its
    * join key at WRITE time, so equi-joins and aggregations between tables
    * bucketed the same way need NO shuffle exchange at read time — the
    * co-located-join discipline for fact⋈fact joins that recur at 100 TB
    * (pay the shuffle once at ingest, never per query). Spark bucketing
    * requires the catalog (saveAsTable); BucketSpec travels with the table
    * metadata. Proven shuffle-free in LedgerSpec. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
}
