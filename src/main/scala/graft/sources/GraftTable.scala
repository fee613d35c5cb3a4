package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The lake-table facade: one handle over a ledger-backed table carrying
  * the full lifecycle a lake user expects — ingest, read (current / time
  * travel / incremental / per-snapshot), row-level merge and delete,
  * compaction, and snapshot expiry. Thin delegation to `Lake`; all scale
  * notes and invariants live there. The reference's analog is the whole
  * dropbox-mover + Iceberg-table workflow
  * (cf. file_transfer_scripts/createMetadatafiles_iceberg_dropbox.sh).
  *
  * {{{
  *   val t = GraftTable(spark, "/lake/events_ledger", "/lake/events_gen")
  *   t.ingest("/dropbox/events")          // exactly-once file ingest
  *   t.read()                             // current snapshot
  *   t.readAt(3)                          // time travel
  *   t.readSince(checkpoint)              // incremental consumption
  *   t.merge(updates, "event_id")         // row-level COW merge
  *   t.delete(col("event_type") === "junk")
  *   t.compact(1000000)                   // small-file rewrite
  *   t.expire(t.snapshot)                 // reclaim unreferenced files
  * }}}
  */
final case class GraftTable(spark: SparkSession, ledgerDir: String,
    genRoot: String) {

  /** Current snapshot id (0 = empty table). */
  def snapshot: Long = Lake.currentSnapshot(spark, ledgerDir)

  /** Ingest new parquet files from a landing dir; returns files added.
    * `statsCols` records a per-file [floor(min), ceil(max)] map of those
    * columns in the ledger so reads data-skip files against filters on
    * any of them; `bloomCols` additionally records a per-file BLOOM
    * filter (string/integral columns) so point lookups skip files even
    * when the column is hash-scattered and min/max can't prune
    * (Lake.ingestNewFiles). */
  def ingest(landingDir: String, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Long =
    Lake.ingestNewFiles(spark, landingDir, ledgerDir, statsCols, bloomCols)

  /** Append rows behind named row-level quality gates: passing rows
    * commit as a snapshot, violating rows quarantine / drop / abort per
    * `onViolation` (see [[Expectations.appendExpect]] — one pass, clean
    * files keep the input schema exactly). */
  def appendExpect(rows: DataFrame,
      expectations: Seq[Expectations.Expectation],
      onViolation: String = "quarantine",
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Expectations.ExpectReport =
    Expectations.appendExpect(spark, ledgerDir, genRoot, rows, expectations,
      onViolation, statsCols, bloomCols)

  /** Rows diverted by [[appendExpect]] with their violation sets. */
  def quarantine(): DataFrame = Expectations.readQuarantine(spark, genRoot)

  /** The table as of the current snapshot. */
  def read(): DataFrame = Lake.readAt(spark, ledgerDir, snapshot)

  /** Snapshot-pinned time travel. */
  def readAt(s: Long): DataFrame = Lake.readAt(spark, ledgerDir, s)

  /** Timestamp time travel (`AS OF <timestamp>`). */
  def readAsOf(ts: java.sql.Timestamp): DataFrame =
    Lake.readAsOf(spark, ledgerDir, ts)

  /** One row per snapshot: commit time, op mix, file counts, bytes. */
  def history(): DataFrame = Lake.history(spark, ledgerDir)

  /** The live file inventory (path, size, per-column stats map) — the
    * metadata view for inspecting data-skipping bounds. */
  def files(): DataFrame = Lake.filesAt(spark, ledgerDir, snapshot)

  /** `count(*)` from MANIFEST metadata alone — zero data-file reads (see
    * Lake.statsCount); None when a live file lacks recorded row counts. */
  def statsCount(at: Long = Long.MaxValue): Option[Long] =
    Lake.statsCount(spark, ledgerDir, at)

  /** Manifest-only min/max + count for integral/string columns (see
    * Lake.statsMinMax); None whenever exactness can't be guaranteed. */
  def statsMinMax(cols: Seq[String],
      at: Long = Long.MaxValue): Option[org.apache.spark.sql.DataFrame] =
    Lake.statsMinMax(spark, ledgerDir, cols, at)

  /** Rows of every row-changing snapshot after `s`, exactly once. */
  def readSince(s: Long): DataFrame = Lake.readSince(spark, ledgerDir, s)

  /** Rows added by exactly snapshot `s`. */
  def readSnapshot(s: Long): DataFrame = Lake.readSnapshot(spark, ledgerDir, s)

  /** Row-changing snapshot ids, oldest first. */
  def rowChangingSnapshots: Seq[Long] =
    Lake.rowChangingSnapshots(spark, ledgerDir)

  /** Row-level copy-on-write MERGE INTO (see Lake.mergeInto).
    * `changeFeed=true` additionally persists the merge's typed row-level
    * effects for `readChanges` consumers (opt-in — roughly doubles merge
    * cost). */
  def merge(source: DataFrame, key: String,
      deleteWhen: Option[Column] = None, changeFeed: Boolean = false,
      evolveSchema: Boolean = false): Long =
    Lake.mergeInto(spark, ledgerDir, genRoot, source, key, deleteWhen,
      changeFeed, evolveSchema)

  /** Explicit widening schema evolution: append `colsDdl` (e.g.
    * `"note STRING, score DOUBLE"`) to the table schema as a KB-scale
    * metadata commit — zero data files touched; pre-evolution rows read
    * null in the new columns (see Lake.addColumns). */
  def addColumns(colsDdl: String): Long =
    Lake.addColumns(spark, ledgerDir,
      org.apache.spark.sql.types.StructType.fromDDL(colsDdl))

  /** Narrowing schema evolution: drop columns as a KB-scale metadata
    * commit — no data rewritten; time travel below still reads them
    * (see Lake.dropColumns; re-adding a dropped name is refused). */
  def dropColumns(names: Seq[String]): Long =
    Lake.dropColumns(spark, ledgerDir, names)

  /** RENAME COLUMN via column-mapping field ids — a KB metadata commit;
    * pre-rename files keep serving the column through their epoch's
    * schema recording (see Lake.renameColumn). */
  def renameColumn(oldName: String, newName: String): Long =
    Lake.renameColumn(spark, ledgerDir, oldName, newName)

  /** ALTER COLUMN TYPE widening (int→bigint, float→double, decimal
    * growth) — a KB metadata commit; pre-widen files scan with their
    * epoch's physical type and cast up in the branch projection (see
    * Lake.alterColumnType; narrowing refuses). */
  def alterColumnType(colName: String, newTypeDdl: String): Long =
    Lake.alterColumnType(spark, ledgerDir, colName,
      org.apache.spark.sql.types.StructType
        .fromDDL(s"x ${newTypeDdl}").head.dataType)

  /** [[merge]] on a COMPOSITE key — equality on every column of `keys`
    * (see Lake.mergeIntoKeys). */
  def mergeKeys(source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None, changeFeed: Boolean = false,
      evolveSchema: Boolean = false): Long =
    Lake.mergeIntoKeys(spark, ledgerDir, genRoot, source, keys, deleteWhen,
      changeFeed, evolveSchema)

  /** Change feed after snapshot `s`: insert / update_preimage /
    * update_postimage / delete rows stamped `_commit_snapshot`. */
  def readChanges(s: Long): DataFrame = Lake.readChanges(spark, ledgerDir, s)

  /** Apply a `readChanges` batch to a downstream mirror (last-writer-wins
    * across multi-snapshot batches). */
  def applyChanges(mirror: DataFrame, changes: DataFrame, key: String): DataFrame =
    Lake.applyChanges(mirror, changes, key)

  /** Bootstrap a downstream mirror of this table at `mirrorDir` (one full
    * read; incremental from then on via the change feed). */
  def mirrorBootstrap(mirrorDir: String): Long =
    graft.streaming.MirrorLoop.bootstrap(spark, ledgerDir, mirrorDir)

  /** One change-feed consumer round: apply every change past the mirror's
    * persisted cursor; returns the new cursor. Exactly-once across crash
    * windows (see MirrorLoop). */
  def mirrorApply(mirrorDir: String, key: String): Long =
    graft.streaming.MirrorLoop.applyRound(spark, ledgerDir, mirrorDir, key)

  /** The mirror's current contents. */
  def mirrorRead(mirrorDir: String): DataFrame =
    graft.streaming.MirrorLoop.mirror(spark, mirrorDir)

  /** The continuously-running consumer: a checkpointed stream that fires
    * a consumer round whenever this table commits. */
  def mirrorStream(mirrorDir: String, key: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.MirrorLoop.changeStream(spark, ledgerDir, mirrorDir, key,
      checkpointDir)

  /** Bootstrap an incrementally-maintained AGGREGATE view of this table
    * (one full aggregate; change-feed folds from then on — see MatView). */
  def viewBootstrap(viewDir: String, spec: graft.streaming.MatView.AggSpec): Long =
    graft.streaming.MatView.bootstrap(spark, ledgerDir, viewDir, spec)

  /** One view-maintenance round: fold every change past the view's
    * persisted cursor; returns the new cursor. O(change batch), never a
    * table rescan on the count/sum path. */
  def viewApply(viewDir: String, spec: graft.streaming.MatView.AggSpec): Long =
    graft.streaming.MatView.applyRound(spark, ledgerDir, viewDir, spec)

  /** The maintained view's current contents. */
  def viewRead(viewDir: String): DataFrame =
    graft.streaming.MatView.view(spark, viewDir)

  /** The continuously-running maintainer: a checkpointed stream that fires
    * a maintenance round whenever this table commits. */
  def viewStream(viewDir: String, spec: graft.streaming.MatView.AggSpec,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.MatView.viewStream(spark, ledgerDir, viewDir, spec,
      checkpointDir)

  /** Plain row append (the INSERT INTO leg — constraints, quarantine and
    * the table's skipping contract all apply; see Lake.appendRows). */
  def append(rows: DataFrame): Long =
    Lake.appendRows(spark, ledgerDir, genRoot, rows)

  /** Atomic whole-table overwrite (the INSERT OVERWRITE / TRUNCATE leg —
    * one snapshot replaces every live file; see Lake.overwriteWith). */
  /** SCOPED overwrite (Delta replaceWhere): atomically replace exactly
    * the rows matching `pred` with `rows` — cost bounded by the
    * predicate's file footprint, survivors rewrite-carried; every
    * incoming row must satisfy `pred` (see Lake.overwriteWhere). */
  def overwriteWhere(pred: Column, rows: DataFrame,
      changeFeed: Boolean = false): Long =
    Lake.overwriteWhere(spark, ledgerDir, genRoot, pred, rows, changeFeed)

  def overwrite(rows: DataFrame, changeFeed: Boolean = false): Long =
    Lake.overwriteWith(spark, ledgerDir, genRoot, rows, changeFeed)

  /** Row-level copy-on-write DELETE WHERE. */
  def delete(cond: Column, changeFeed: Boolean = false): Long =
    Lake.deleteWhere(spark, ledgerDir, genRoot, cond, changeFeed)

  /** Row-level copy-on-write UPDATE … SET … WHERE (see Lake.updateWhere —
    * affected-file rewrites, pre-image assignment semantics, CHECK
    * constraints on the post-image). */
  def update(cond: Column, sets: Seq[(String, Column)],
      changeFeed: Boolean = false): Long =
    Lake.updateWhere(spark, ledgerDir, genRoot, cond, sets, changeFeed)

  /** Bind `name` for SQL: reads via a temp view AND `MERGE INTO` /
    * `UPDATE` / `DELETE FROM` / `VERSION AS OF` text routed to this
    * table's merge/update/delete/readAt (see [[GraftSql]]). */
  def bindSql(name: String): Unit = GraftSql.bind(name, this)

  /** Execute SQL (one statement or a `;`-separated script) with this
    * session's bound lake tables DML-routable; returns the last
    * statement's result. */
  def sql(text: String): DataFrame = GraftSql.sql(spark, text)

  /** Row-level MERGE-ON-READ delete: records the matching rows' positions
    * as deletion vectors instead of rewriting files — the write-optimized
    * half of the COW/MOR trade (see Lake.deleteWhereMor). Readers apply
    * vectors automatically; any rewrite (merge/delete/compact) of a file
    * materializes them. */
  def deleteMor(cond: Column, changeFeed: Boolean = false): Long =
    Lake.deleteWhereMor(spark, ledgerDir, genRoot, cond, changeFeed)

  /** MOR delete keyed by a RELATION: rows whose `keyCol` appears in
    * `keys` tombstone via a semi-join — the backfill-safe form (no
    * driver-side key list; see Lake.deleteWhereMorKeys). */
  def deleteMorKeys(keys: DataFrame, keyCol: String,
      changeFeed: Boolean = false): Long =
    Lake.deleteWhereMorKeys(spark, ledgerDir, genRoot, keys, keyCol,
      changeFeed)

  /** [[deleteMorKeys]] on a COMPOSITE key (see
    * Lake.deleteWhereMorKeysCols). */
  def deleteMorKeysCols(keys: DataFrame, keyCols: Seq[String],
      changeFeed: Boolean = false): Long =
    Lake.deleteWhereMorKeysCols(spark, ledgerDir, genRoot, keys, keyCols,
      changeFeed)

  /** Row-level MERGE-ON-READ merge: identical row semantics to `merge`
    * but superseded target rows become deletion vectors and the
    * update+insert rows land as one delta — no file rewrites (see
    * Lake.mergeIntoMor). The write-optimized upsert for high-frequency
    * CDC sinks; change-feed consumers work unchanged. */
  def mergeMor(source: DataFrame, key: String,
      deleteWhen: Option[Column] = None,
      changeFeed: Boolean = false): Long =
    Lake.mergeIntoMor(spark, ledgerDir, genRoot, source, key, deleteWhen,
      changeFeed)

  /** [[mergeMor]] on a COMPOSITE key (see Lake.mergeIntoMorKeys). */
  def mergeMorKeys(source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None,
      changeFeed: Boolean = false): Long =
    Lake.mergeIntoMorKeys(spark, ledgerDir, genRoot, source, keys,
      deleteWhen, changeFeed)

  /** Streaming CDC upsert sink into this table: each micro-batch of the
    * keyed feed applies as one metadata-sized MOR merge (latest row per
    * key wins, `deleteWhen` rows are tombstones, replayed batches no-op —
    * see streaming.UpsertLoop). Caller sets checkpointLocation + starts. */
  def upsertStream(stream: DataFrame, key: String, orderCol: String,
      deleteWhen: Option[Column] = None, changeFeed: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    graft.streaming.UpsertLoop.upsertStream(stream, ledgerDir, genRoot,
      key, orderCol, deleteWhen, changeFeed)

  /** Tag a snapshot by name (current by default) — time travel by name;
    * `readTag`/`tags`/`deleteTag` complete the surface. */
  def tag(name: String, snapshot: Long = -1L): Unit =
    Lake.tagSnapshot(spark, ledgerDir, name,
      if (snapshot < 0) Lake.currentSnapshot(spark, ledgerDir) else snapshot)

  def readTag(name: String): DataFrame = Lake.readTag(spark, ledgerDir, name)

  def tags(): Seq[(String, Long)] = Lake.tags(spark, ledgerDir)

  def deleteTag(name: String): Boolean = Lake.deleteTag(ledgerDir, name)

  /** Zero-copy BRANCH of this table into `branchDir` — writes on the
    * branch stay invisible to this table until [[publish]]
    * (Lake.branch). Returns the fork snapshot. */
  def branch(branchDir: String): Long = Lake.branch(spark, ledgerDir, branchDir)

  /** Shallow CLONE pinned to a past snapshot (experimentation fork —
    * cannot publish; Lake.branchAt). */
  def cloneAt(branchDir: String, atSnapshot: Long): Long =
    Lake.branchAt(spark, ledgerDir, branchDir, atSnapshot)

  /** Shallow clone pinned to a TAG (Lake.branchAt ∘ Lake.tagged). */
  def cloneTag(branchDir: String, tag: String): Long =
    Lake.branchAt(spark, ledgerDir, branchDir,
      Lake.tagged(ledgerDir, tag).getOrElse(
        throw new IllegalArgumentException(s"no such tag: $tag")))

  /** Fast-forward this table onto a branch's head; throws
    * `PublishConflictException` if this table moved since the fork
    * (Lake.publish). */
  def publish(branchDir: String): Seq[Long] = Lake.publish(spark, branchDir)

  /** Drop an unpublished branch (Lake.abandonBranch). */
  def abandonBranch(branchDir: String): Unit = Lake.abandonBranch(branchDir)

  /** Add a standing CHECK constraint every row-writing operation must
    * satisfy (refused if current data violates it; Lake.addConstraint). */
  def addConstraint(name: String, expression: String): Unit =
    Lake.addConstraint(spark, ledgerDir, name, expression)

  /** The table's standing constraints. */
  def constraints(): Seq[(String, String)] = Lake.constraints(ledgerDir)

  /** Drop a constraint (idempotent). */
  def dropConstraint(name: String): Boolean =
    Lake.dropConstraint(ledgerDir, name)

  /** Row-level snapshot diff, file-pruned to the write waves' blast
    * radius (Lake.tableDiff; key-unique tables). */
  def diff(fromSnap: Long, toSnap: Long, key: String): DataFrame =
    Lake.tableDiff(spark, ledgerDir, fromSnap, toSnap, key)

  /** Fold the per-commit ledger files into one checkpoint and prune them
    * — metadata compaction; every read surface is unchanged
    * (Lake.compactLedger). */
  def compactLedger(): Long = Lake.compactLedger(spark, ledgerDir)

  /** Crashed-writer debris under the gen root: parquet no ledger row
    * references, older than the safety horizon (Lake.orphanFiles;
    * distinct from `orphans()`, the orphaned COMMIT-id surface). */
  def orphanedFiles(olderThanMs: Long): Seq[String] =
    Lake.orphanFiles(spark, ledgerDir, genRoot, olderThanMs)

  /** Delete the orphan set (Lake.removeOrphans). */
  def removeOrphans(olderThanMs: Long): Seq[String] =
    Lake.removeOrphans(spark, ledgerDir, genRoot, olderThanMs)

  /** WRITE-AUDIT-PUBLISH: fork, run `write(branchLedger, branchGen)`,
    * gate on `audit(branchHead)`, fast-forward or abandon
    * (Lake.writeAuditPublish). */
  def writeAuditPublish(wapDir: String)(write: (String, String) => Unit)(
      audit: DataFrame => Boolean): Option[Seq[Long]] =
    Lake.writeAuditPublish(spark, ledgerDir, wapDir)(write)(audit)

  /** Active deletion-vector rows at the current snapshot — the table's
    * accumulated MOR debt (0 right after a full compaction). */
  def dvRows(): Long = Lake.dvRows(spark, ledgerDir)

  /** Rewrite the live file set toward a target rows-per-file. With
    * `zOrder=true` and ≥2 numeric stats columns, the rewrite clusters on
    * the Morton interleave of the first two so filters on EITHER keep
    * data-skipping after the rewrite (OPTIMIZE ZORDER). */
  def compact(targetRowsPerFile: Long, zOrder: Boolean = false,
      where: Option[Column] = None, zOrderBy: Seq[String] = Nil): Long =
    Lake.compactIngested(spark, ledgerDir, genRoot, targetRowsPerFile, zOrder,
      where, zOrderBy)

  /** Backfill data-skipping stats (and blooms) for live files lacking
    * them — zero data movement, invisible to incremental consumers (see
    * Lake.backfillStats). Returns files re-statted. */
  def analyze(statsCols: Seq[String], bloomCols: Seq[String] = Nil): Long =
    Lake.backfillStats(spark, ledgerDir, statsCols, bloomCols)

  /** Roll the table back to snapshot `s` as a NEW snapshot (the RESTORE /
    * rollback analog); history and deeper time travel retained. */
  def restore(s: Long): Long = Lake.restore(spark, ledgerDir, s)

  /** Expire snapshots before `retainFrom`; returns files deleted. */
  def expire(retainFrom: Long): Long =
    Lake.expireSnapshots(spark, ledgerDir, retainFrom)

  /** Register the table's CURRENT snapshot under `name` so plain
    * `spark.sql` works against the lake (manifest-driven scan, data
    * skipping and schema evolution included — the view IS readAt's
    * plan). Snapshot-pinned at registration like any table format's
    * read: re-register (or call again) to see later commits. */
  def createOrReplaceTempView(name: String): Unit =
    read().createOrReplaceTempView(name)

  /** Policy-driven maintenance pass (auto-OPTIMIZE / auto-VACUUM): restat
    * files missing the skipping contract, compact when enough small files
    * accumulated, optionally expire beyond a retention window — only what
    * the KB-scale manifest says the table needs. Idempotent. */
  def maintain(policy: Lake.MaintenancePolicy = Lake.MaintenancePolicy())
      : Lake.MaintenanceReport =
    Lake.maintain(spark, ledgerDir, s"$genRoot/compact", policy)

  // ------------------------------------------------ concurrent writers

  /** Run `op` (typically one of this table's write methods) under
    * whole-operation OCC retry: a [[Lake.ConcurrentCommitException]]
    * collision re-runs `op` against the freshly-read table state — the
    * rebase — up to `attempts` times. The multi-writer form of every
    * write on this facade:
    * {{{ t.withRetry() { t.merge(batch, "event_id") } }}} */
  def withRetry[T](attempts: Int = 5)(op: => T): T =
    Lake.commitRetry(attempts)(op)

  /** Snapshot ids reserved by a writer that hard-crashed before its rows
    * landed (in-process failures auto-release; this surfaces
    * cross-process orphans blocking the next id). */
  def orphans(): Seq[Long] = Lake.orphanedCommits(spark, ledgerDir)

  /** Operator recovery for a dead reservation: frees the id for the next
    * writer; refuses (false) when the snapshot actually landed. */
  def release(s: Long): Boolean = Lake.releaseCommit(spark, ledgerDir, s)
}
