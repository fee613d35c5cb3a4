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
}
