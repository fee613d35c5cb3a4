package graft.operators

import graft.sources.{GraftTable, Lake}
import graft.streaming.MirrorLoop
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.C — MAINTAINED PERPLEXITY MODEL off the change feed: the
  * DsirDelta discipline applied to the CCNet-style bigram LM
  * ([[TextOps.qDocPerplexity]]). A reference LM over a living corpus
  * must follow inserts, rewrites, and deletions — and the model is
  * nothing more than hashed CONTEXT counts and hashed BIGRAM counts,
  * which are EXACTLY additive:
  *
  *   counts += counts(inserts ∪ update_postimages)
  *          −  counts(deletes ∪ update_preimages)
  *
  * — one batch-sized bigram pass per side, two ≤B-row aggregations,
  * one KB state write. The integer fold is LOSSLESS: the maintained
  * model equals the from-scratch recompute bit-for-bit forever
  * (PerplexityDeltaSpec asserts exact equality), unlike any float
  * fold.
  *
  * The batch operator's explicit (a, b) vocabulary becomes HASHED
  * buckets here (the DsirDelta trade): hashing bounds the state at
  * B1+B2 longs at ANY corpus size, so a maintenance round costs the
  * change batch, never the table — the same estimator over a coarser
  * bucketing, spec-pinned against an independent local reference.
  * Add-1 smoothing uses ACTIVE context buckets + 1, not the table
  * size (the DsirDelta +B pseudo-mass lesson).
  *
  * State lives under `root/gen-<cursor>/` with the MirrorLoop cursor
  * discipline (cursor marks LAST; a crash between state write and
  * cursor leaves the previous round authoritative; old gens prune). */
object PerplexityDelta {

  /** Context / bigram hash buckets (fixed state size). */
  val CtxBuckets = 2048
  val BigBuckets = 8192

  private def genDir(root: String, snap: Long) = s"$root/gen-$snap"

  private def writeState(spark: SparkSession, root: String, snap: Long,
      ctxC: Array[Long], bigC: Array[Long]): Unit = {
    import spark.implicits._
    Seq((ctxC.toSeq, bigC.toSeq)).toDF("ctx_c", "big_c")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${genDir(root, snap)}/counts")
  }

  /** The maintained (context, bigram) bucket counts at the cursor. */
  def counts(spark: SparkSession, root: String): (Array[Long], Array[Long]) = {
    val cur = MirrorLoop.cursorOf(spark, root).getOrElse(
      throw new IllegalStateException(s"ppl state at $root not bootstrapped"))
    val r = spark.read.parquet(s"${genDir(root, cur)}/counts").head()
    (r.getSeq[Long](0).toArray, r.getSeq[Long](1).toArray)
  }

  /** Hashed bigram stream of a documents frame: one row per adjacent
    * pair with its context bucket b1 = h(a) and bigram bucket
    * b2 = h(a·b). The context count of `a` is by definition the number
    * of bigrams with left token `a`, so ONE stream feeds both counts. */
  private def bucketed(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2) // sequence(1,0) counts DOWN — guard
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("a"),
            concat(element_at(col("t"), i), lit(" "),
              element_at(col("t"), i + 1)).as("ab")))).as("p"))
      .select(col("doc_id"),
        pmod(xxhash64(col("p.a")), lit(CtxBuckets)).cast("int").as("b1"),
        pmod(xxhash64(col("p.ab")), lit(BigBuckets)).cast("int").as("b2"))

  /** Per-bucket counts of a batch — two ≤B-row collects off one pass. */
  private def batchCounts(docs: DataFrame): (Array[Long], Array[Long]) = {
    val ctxC = new Array[Long](CtxBuckets)
    val bigC = new Array[Long](BigBuckets)
    val st = bucketed(docs).localCheckpoint()
    st.groupBy(col("b1")).agg(count(lit(1)).as("n")).collect()
      .foreach(r => ctxC(r.getInt(0)) = r.getLong(1))
    st.groupBy(col("b2")).agg(count(lit(1)).as("n")).collect()
      .foreach(r => bigC(r.getInt(0)) = r.getLong(1))
    (ctxC, bigC)
  }

  /** Fit the state from the source lake's current snapshot; no-op when
    * already bootstrapped. */
  def bootstrap(spark: SparkSession, srcLedger: String, root: String): Long =
    MirrorLoop.cursorOf(spark, root).getOrElse {
      MirrorLoop.rmrf(new java.io.File(root))
      val snap = Lake.currentSnapshot(spark, srcLedger)
      val (ctxC, bigC) = batchCounts(Lake.readAt(spark, srcLedger, snap))
      writeState(spark, root, snap, ctxC, bigC)
      MirrorLoop.markCursor(spark, root, snap)
      snap
    }

  /** Fold every source change past the cursor into the counts. Returns
    * the new cursor (unchanged when no commit landed). */
  def applyRound(spark: SparkSession, srcLedger: String, root: String): Long = {
    val cur = MirrorLoop.cursorOf(spark, root).getOrElse(
      throw new IllegalStateException(s"ppl state at $root not bootstrapped"))
    val changes = Lake.readChanges(spark, srcLedger, cur)
    if (changes.isEmpty) return cur
    val target = changes.agg(max(col("_commit_snapshot"))).head().getLong(0)
    val batch = changes.localCheckpoint()
    val (ctxC, bigC) = counts(spark, root)
    def fold(df: DataFrame, sign: Int): Unit =
      if (!df.isEmpty) {
        val (bc, bb) = batchCounts(df)
        var i = 0
        while (i < CtxBuckets) { ctxC(i) += sign * bc(i); i += 1 }
        i = 0
        while (i < BigBuckets) { bigC(i) += sign * bb(i); i += 1 }
      }
    fold(batch.filter(
      col("_change_type").isin("insert", "update_postimage")), 1)
    fold(batch.filter(
      col("_change_type").isin("delete", "update_preimage")), -1)
    writeState(spark, root, target, ctxC, bigC)
    MirrorLoop.markCursor(spark, root, target)
    MirrorLoop.pruneGens(root, target)
    target
  }

  /** Score a documents frame against the MAINTAINED model — the
    * [[TextOps.qDocPerplexity]] NLL over the hashed bucketing: per
    * bigram, L(ctx(b1)+V) − L(big(b2)+1) on the 1e6 quantized-log grid
    * with V = active context buckets + 1; a doc's NLL is an exact
    * integer sum. The two bucket lookups build from the driver state
    * and broadcast. */
  def score(spark: SparkSession, root: String, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val (ctxC, bigC) = counts(spark, root)
    val vp = ctxC.count(_ > 0).toLong + 1
    def lq(x: Long): Long = math.floor(1e6 * math.log(x.toDouble)).toLong
    val lCtx = (0 until CtxBuckets).map(b =>
      (b, lq(ctxC(b) + vp))).toDF("b1", "lc")
    val lBig = (0 until BigBuckets).map(b =>
      (b, lq(bigC(b) + 1))).toDF("b2", "lb")
    bucketed(docs).join(lCtx, Seq("b1")).join(lBig, Seq("b2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bg"),
        sum(col("lc") - col("lb")).cast("long").as("nll_scaled"))
      .select(col("doc_id"), col("n_bg"), col("nll_scaled"),
        (col("nll_scaled").cast("double") /
          (col("n_bg") * lit(1000000L)).cast("double")).as("nll_per_token"))
  }

  /** Continuous maintenance: a file stream on the source LEDGER fires
    * one fold per micro-batch (cursor-replay-safe). */
  def maintainStream(spark: SparkSession, srcLedger: String, root: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    MirrorLoop.ledgerWatcher(spark, srcLedger, checkpointDir) { () =>
      applyRound(spark, srcLedger, root): Unit
    }

  /** Driver-gate entry ([rows] — the hashed bucketing has no SQL
    * oracle; PerplexityDeltaSpec carries exact maintained ≡ recompute
    * equality): lake the documents table, bootstrap the LM state, land
    * one mixed insert/update/delete wave through the change feed, fold
    * it, then score the CURRENT table from the maintained model — zero
    * full-corpus re-reads after bootstrap. */
  def qDocPerplexityDelta(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ppld").toString
    val src = GraftTable(spark, s"$tmp/src_ledger", s"$tmp/src_gen")
    val root = s"$tmp/ppl"
    graft.BenchPhase("fixture") {
      spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text", "lang")
        .repartition(4).write.parquet(s"$tmp/landing")
      src.ingest(s"$tmp/landing")
      bootstrap(spark, src.ledgerDir, root): Unit
      val maxId = src.read().agg(max(col("doc_id"))).head().getLong(0)
      // wave: one in-distribution arrival, one gibberish arrival (the
      // doc a perplexity gate exists to catch), a rewrite, a deletion
      val fresh = Seq(
        (maxId + 1, "the table scan joins the sorted batch rows", "en"),
        (maxId + 2, "zq qv vj jx xk kw wz zz qq vv", "en"))
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
