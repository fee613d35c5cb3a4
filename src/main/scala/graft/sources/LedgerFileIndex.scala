package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.functions.col
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
  * data size.
  *
  * DATA SKIPPING: when ledger rows carry per-file (stats_col, stats_min,
  * stats_max) — recorded by `ingestNewFiles(statsCol = ...)` and carried
  * through compaction — `listFiles` prunes files whose [min, max] range
  * provably cannot satisfy the pushed data filters on that column
  * (=, <, <=, >, >=, IN; null stats never skip). At 100 TB this is the
  * manifest's whole point: a point query on a range-clustered key opens
  * ONE file, not the table. */
final class LedgerFileIndex(liveActions: DataFrame) extends FileIndex {

  /** (path, size, statsMin, statsMax) of the live file set, materialized
    * once at first scan planning. Sizes/stats ride along from the ledger
    * (recorded at ingest), so Spark can split scan tasks and skip files
    * without statting or opening any of them. */
  private lazy val entries: Seq[(FileStatus, Option[(Long, Long)])] = liveActions
    .select(col("path"), col("size"), col("stats_min"), col("stats_max"))
    .collect()
    .map { r =>
      val st = new FileStatus(r.getLong(1), false, 1, 128L * 1024 * 1024, 0L,
        new Path(r.getString(0)))
      val stats =
        if (r.isNullAt(2) || r.isNullAt(3)) None
        else Some((r.getLong(2), r.getLong(3)))
      (st, stats)
    }.toSeq

  /** The column the per-file stats describe (single stats column design). */
  private lazy val statsColName: Option[String] = liveActions
    .select(col("stats_col"))
    .filter(col("stats_col").isNotNull)
    .limit(1).collect().headOption.map(_.getString(0))

  def isEmpty: Boolean = entries.isEmpty

  override def rootPaths: Seq[Path] = entries.map(_._1.getPath)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = statsColName match {
      case Some(c) =>
        val bounds = dataFilters.filter(referencesOnly(_, c))
        entries.filter {
          case (_, Some((lo, hi))) =>
            bounds.forall(f => mayMatch(f, c, lo, hi))
          case _ => true // no stats recorded for this file: never skip
        }
      case None => entries
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
  }

  /** Conservative filter evaluation against a file's [lo, hi] value range:
    * true unless the filter PROVABLY matches no value in the range. Any
    * shape not understood returns true (never skip on uncertainty). */
  private def mayMatch(f: Expression, c: String, lo: Long, hi: Long): Boolean =
    f match {
      case EqualTo(a, Literal(v, _)) if isCol(a, c) =>
        asLong(v).forall(x => x >= lo && x <= hi)
      case EqualTo(Literal(v, _), a) if isCol(a, c) =>
        asLong(v).forall(x => x >= lo && x <= hi)
      case GreaterThan(a, Literal(v, _)) if isCol(a, c) => asLong(v).forall(hi > _)
      case GreaterThanOrEqual(a, Literal(v, _)) if isCol(a, c) => asLong(v).forall(hi >= _)
      case LessThan(a, Literal(v, _)) if isCol(a, c) => asLong(v).forall(lo < _)
      case LessThanOrEqual(a, Literal(v, _)) if isCol(a, c) => asLong(v).forall(lo <= _)
      case GreaterThan(Literal(v, _), a) if isCol(a, c) => asLong(v).forall(lo < _)
      case GreaterThanOrEqual(Literal(v, _), a) if isCol(a, c) => asLong(v).forall(lo <= _)
      case LessThan(Literal(v, _), a) if isCol(a, c) => asLong(v).forall(hi > _)
      case LessThanOrEqual(Literal(v, _), a) if isCol(a, c) => asLong(v).forall(hi >= _)
      case In(a, vs) if isCol(a, c) && vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists { case Literal(v, _) =>
          asLong(v).forall(x => x >= lo && x <= hi) }
      case And(l, r) => mayMatch(l, c, lo, hi) && mayMatch(r, c, lo, hi)
      case Or(l, r) => mayMatch(l, c, lo, hi) || mayMatch(r, c, lo, hi)
      case IsNotNull(_) => true
      case _ => true
    }

  private def isCol(e: Expression, c: String): Boolean = e match {
    case a: AttributeReference => a.name == c
    case Cast(a: AttributeReference, _, _, _) => a.name == c
    case _ => false
  }

  private def referencesOnly(f: Expression, c: String): Boolean =
    f.references.nonEmpty && f.references.forall(_.name == c)

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  override def inputFiles: Array[String] =
    entries.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = entries.map(_._1.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)
}
