package graft.operators

import graft.sources.{GraftTable, Lake}
import graft.streaming.MirrorLoop
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.C — MAINTAINED DSIR IMPORTANCE MODEL off the change feed: the
  * MomentsDelta discipline applied to DATA SELECTION. A growing corpus
  * re-scores its importance weights as the raw distribution drifts —
  * but the DSIR model is nothing more than per-bucket feature counts
  * for the raw corpus and the target slice, and counts are EXACTLY
  * additive:
  *
  *   counts += counts(inserts ∪ update_postimages)
  *          −  counts(deletes ∪ update_preimages)
  *
  * — one batch-sized hashed-featurize pass per side, a ≤B-row collect,
  * and a KB state write. Unlike the float moment fold (MomentsDelta's
  * documented 1e-9 drift), the integer fold is LOSSLESS: the maintained
  * model equals the from-scratch recompute bit-for-bit, forever — no
  * refit cadence needed (DsirDeltaSpec asserts exact equality).
  *
  * This is also where the paper's HASHED buckets (vs the batch
  * [[Sampling.qDocDsir]]'s oracle-able top-V vocabulary) earn their
  * keep: hashing bounds the model at B rows BY CONSTRUCTION, so the
  * maintained state is a fixed 2·B long array at any corpus size and a
  * round's cost is the change batch, never the table. The two variants
  * are the same estimator over different bucketings — the spec pins the
  * hashed scorer against an independent local reference.
  *
  * State lives under `root/gen-<cursor>/` with the MirrorLoop cursor
  * discipline (cursor marks LAST; a crash between state write and
  * cursor leaves the previous round authoritative; old gens prune). */
object DsirDelta {

  /** Hash buckets — the paper's model dimension (fixed state size). */
  val Buckets = 4096

  private def genDir(root: String, snap: Long) = s"$root/gen-$snap"

  private def writeState(spark: SparkSession, root: String, snap: Long,
      rawC: Array[Long], tgtC: Array[Long]): Unit = {
    import spark.implicits._
    Seq((rawC.toSeq, tgtC.toSeq)).toDF("raw_c", "tgt_c")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${genDir(root, snap)}/counts")
  }

  /** The maintained per-bucket (raw, target) counts at the cursor. */
  def counts(spark: SparkSession, root: String): (Array[Long], Array[Long]) = {
    val cur = MirrorLoop.cursorOf(spark, root).getOrElse(
      throw new IllegalStateException(s"dsir state at $root not bootstrapped"))
    val r = spark.read.parquet(s"${genDir(root, cur)}/counts").head()
    (r.getSeq[Long](0).toArray, r.getSeq[Long](1).toArray)
  }

  /** Hashed unigram+bigram bucket stream for a documents frame:
    * (doc_id, __tgt, b) — one row per feature occurrence, the flag
    * carried through the explode (no join-back). Scoring passes
    * `lit(false)` so UNLABELED docs score fine — only the count folds
    * need the lang column. */
  private def bucketed(docs: DataFrame,
      flag: Column = isTarget): DataFrame =
    docs
      .select(col("doc_id"), flag.as("__tgt"),
        TextOps.tokens(col("text")).as("t"))
      .withColumn("feats", concat(col("t"),
        when(size(col("t")) >= 2,
          transform(sequence(lit(1), size(col("t")) - 1),
            i => concat(element_at(col("t"), i), lit(" "),
              element_at(col("t"), i + 1))))
          .otherwise(array())))
      .select(col("doc_id"), col("__tgt"), explode(col("feats")).as("f"))
      .select(col("doc_id"), col("__tgt"),
        pmod(xxhash64(col("f")), lit(Buckets)).cast("int").as("b"))

  private def isTarget: Column = col("lang") === "en"

  /** Per-bucket (raw, tgt) counts of a batch — a ≤B-row collect. */
  private def batchCounts(docs: DataFrame): (Array[Long], Array[Long]) = {
    val rawC = new Array[Long](Buckets)
    val tgtC = new Array[Long](Buckets)
    bucketed(docs)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n"), count(when(col("__tgt"), 1)).as("nt"))
      .collect().foreach { r =>
        rawC(r.getInt(0)) = r.getLong(1)
        tgtC(r.getInt(0)) = r.getLong(2)
      }
    (rawC, tgtC)
  }

  /** Fit the state from the source lake's current snapshot; no-op when
    * already bootstrapped. */
  def bootstrap(spark: SparkSession, srcLedger: String, root: String): Long =
    MirrorLoop.cursorOf(spark, root).getOrElse {
      MirrorLoop.rmrf(new java.io.File(root))
      val snap = Lake.currentSnapshot(spark, srcLedger)
      val (rawC, tgtC) = batchCounts(Lake.readAt(spark, srcLedger, snap))
      writeState(spark, root, snap, rawC, tgtC)
      MirrorLoop.markCursor(spark, root, snap)
      snap
    }

  /** Fold every source change past the cursor into the counts: two
    * batch-sized featurize passes + one KB state write. Returns the new
    * cursor (unchanged when no commit landed). */
  def applyRound(spark: SparkSession, srcLedger: String, root: String): Long = {
    val cur = MirrorLoop.cursorOf(spark, root).getOrElse(
      throw new IllegalStateException(s"dsir state at $root not bootstrapped"))
    val changes = Lake.readChanges(spark, srcLedger, cur)
    if (changes.isEmpty) return cur
    val target = changes.agg(max(col("_commit_snapshot"))).head().getLong(0)
    // counts fold over change ROWS directly (both update images ride the
    // feed) — the per-row additive identity, like the moment fold
    val batch = changes.localCheckpoint()
    val (rawC, tgtC) = counts(spark, root)
    def fold(df: DataFrame, sign: Int): Unit =
      if (!df.isEmpty) {
        val (br, bt) = batchCounts(df)
        var i = 0
        while (i < Buckets) {
          rawC(i) += sign * br(i); tgtC(i) += sign * bt(i); i += 1
        }
      }
    fold(batch.filter(
      col("_change_type").isin("insert", "update_postimage")), 1)
    fold(batch.filter(
      col("_change_type").isin("delete", "update_preimage")), -1)
    writeState(spark, root, target, rawC, tgtC)
    MirrorLoop.markCursor(spark, root, target)
    MirrorLoop.pruneGens(root, target)
    target
  }

  /** Score a documents frame against the MAINTAINED model — the
    * [[Sampling.qDocDsir]] estimator over the hashed bucketing: every
    * bucket is live (no OOV), L_b and the normalizer quantize to scaled
    * BIGINTs, a doc's score is an exact integer sum. The B-row lookup
    * builds from the driver state and broadcasts. */
  def score(spark: SparkSession, root: String, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val (rawC, tgtC) = counts(spark, root)
    val nRaw = rawC.sum
    val nTgt = tgtC.sum
    // smoothing dimension = ACTIVE buckets + 1, not B: most of a 4096-
    // bucket table is empty at moderate vocabulary, and +B pseudo-mass
    // systematically depresses every score (~−0.06/feature measured —
    // 4 of 500 docs selected vs the batch variant's ~44%). Active count
    // derives exactly from the maintained state, so the maintained and
    // fresh scorers stay bit-equal.
    val vp = rawC.count(_ > 0) + 1
    def lq(a: Long, b: Long): Long =
      math.floor(1e6 * math.log(a.toDouble / b.toDouble)).toLong
    val l0 = lq(nRaw + vp, nTgt + vp)
    val lf = (0 until Buckets).map(b =>
      (b, lq(tgtC(b) + 1, rawC(b) + 1))).toDF("b", "lf")
    bucketed(docs, lit(false)).join(lf, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"),
        sum(col("lf") + lit(l0)).cast("long").as("score_scaled"))
      .select(col("doc_id"), col("n_feat"), col("score_scaled"),
        (col("score_scaled") > 0).as("selected"))
  }

  /** Continuous maintenance: a file stream on the source LEDGER fires
    * one fold per micro-batch (cursor-replay-safe). */
  def maintainStream(spark: SparkSession, srcLedger: String, root: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    MirrorLoop.ledgerWatcher(spark, srcLedger, checkpointDir) { () =>
      applyRound(spark, srcLedger, root): Unit
    }

  /** Driver-gate entry ([rows] — the hashed bucketing has no SQL oracle;
    * DsirDeltaSpec carries exact maintained ≡ recompute equality): lake
    * the documents table, bootstrap the count state, land one mixed
    * insert/update/delete wave through the change feed, fold it, then
    * score the CURRENT table from the maintained model — zero full-
    * corpus re-reads after bootstrap. Fixture vs op bench-phase-split. */
  def qDocDsirDelta(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsird").toString
    val src = GraftTable(spark, s"$tmp/src_ledger", s"$tmp/src_gen")
    val root = s"$tmp/dsir"
    graft.BenchPhase("fixture") {
      spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text", "lang")
        .repartition(4).write.parquet(s"$tmp/landing")
      src.ingest(s"$tmp/landing")
      bootstrap(spark, src.ledgerDir, root): Unit
      val maxId = src.read().agg(max(col("doc_id"))).head().getLong(0)
      // wave: three arrivals (one clearly on-target), one text rewrite,
      // one deletion — the live-corpus churn a maintained model absorbs
      val fresh = Seq(
        (maxId + 1, "the quick brown fox jumps over the lazy dog", "en"),
        (maxId + 2, "lorem ipsum dolor sit amet consectetur", "fr"),
        (maxId + 3, "data selection via importance resampling works", "en"))
        .toDF("doc_id", "text", "lang")
      val rewrite = src.read().orderBy(col("doc_id")).limit(1)
        .select(col("doc_id"),
          concat(col("text"), lit(" rewritten tail")).as("text"), col("lang"))
      src.merge(fresh.unionByName(rewrite), "doc_id", changeFeed = true)
      src.merge(
        Seq((maxId, "", "")).toDF("doc_id", "text", "lang"),
        "doc_id", deleteWhen = Some(lit(true)), changeFeed = true): Unit
    }
    val out = graft.BenchPhase("op") {
      applyRound(spark, src.ledgerDir, root)
      score(spark, root, src.read()).localCheckpoint()
    }
    MirrorLoop.rmrf(new java.io.File(tmp))
    out
  }
}
