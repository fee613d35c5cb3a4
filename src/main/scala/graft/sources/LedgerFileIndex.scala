package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Manifest-driven `FileIndex` — the production form of the ledger reads
  * (SURVEY §3.9): the scan's file list and sizes come from the LEDGER
  * relation, not from a filesystem walk, exactly how table formats
  * (Iceberg/Delta) integrate with Spark. File metadata materializes ONCE,
  * lazily, inside the index when Spark plans the scan — `Lake.readAt` no
  * longer collects a path list itself, and no per-file stat/list RPCs are
  * issued (at 100 TB against object storage, the listing round-trips are
  * the dominant planning cost this kills). Driver memory still holds the
  * file metadata during planning — that is Spark's `FileIndex` contract
  * itself and every format shares it; the bound is manifest size, not
  * data size. */
final class LedgerFileIndex(liveActions: DataFrame) extends FileIndex {

  /** (path, size) of the live file set, materialized once at first scan
    * planning. Sizes ride along from the ledger (recorded at ingest), so
    * Spark can split/pack scan tasks without statting any file. */
  private lazy val statuses: Seq[FileStatus] = liveActions
    .select(col("path"), col("size"))
    .collect()
    .map { r =>
      new FileStatus(r.getLong(1), false, 1, 128L * 1024 * 1024, 0L,
        new Path(r.getString(0)))
    }.toSeq

  def isEmpty: Boolean = statuses.isEmpty

  override def rootPaths: Seq[Path] = statuses.map(_.getPath)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))

  override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.map(_.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)
}
