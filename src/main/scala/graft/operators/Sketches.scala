package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.Tables

/** §2.C/§2.D widening — MERGEABLE-SKETCH analytics, the bounded-memory
  * single-pass shapes a 100 TB corpus forces when exact per-key state
  * would itself be data-scaled:
  *
  *  - heavy hitters WITHOUT a vocabulary shuffle: a KPS frequent-items
  *    pass bounds the candidate set at 1/support items and a Count-Min
  *    sketch (one mergeable binary, map-side combined — only KB-sized
  *    counter arrays ever shuffle) supplies their estimated counts;
  *  - distinct-count sketches that PERSIST and UNION: per-source HLL
  *    sketches whose binary registers merge losslessly (the same
  *    estimate as sketching the union directly — the property that lets
  *    per-day/per-partition sketches roll up without rescanning), the
  *    incremental-analytics primitive behind every "distinct users this
  *    quarter" dashboard.
  *
  * Both collect ONLY sketch-sized state to the driver (a ≤1/support
  * candidate list + a KB binary; the control-plane exception of §3 rule
  * 3) — the corpus passes stay fully distributed and single-scan.
  */
object Sketches {

  /** Sketch-based heavy hitters over the token stream: tokens whose
    * frequency exceeds `support` of the corpus, with Count-Min estimated
    * counts. The KPS pass guarantees every true heavy hitter is a
    * candidate (superset property); CMS never underestimates, so no true
    * heavy hitter can be filtered out — precision is bounded by the CMS
    * overestimate (≤ eps·N with the configured confidence, spec-bounded).
    * [rows]: estimates are engine-specific (SketchSpec bounds them
    * against exact counts). */
  def qTokHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val support = 0.005
    val toks = Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val cand: Seq[String] = toks.stat.freqItems(Seq("token"), support)
      .head.getSeq[String](0)
    val skBytes = toks
      .agg(count_min_sketch(col("token"), lit(1e-4), lit(0.99), lit(42))
        .as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val cms = CountMinSketch.readFrom(skBytes)
    val thresh = (support * cms.totalCount()).toLong
    val rows = cand.map(t => (t, cms.estimateCount(t)))
      .filter(_._2 >= thresh)
      .sortBy { case (t, c) => (-c, t) }
    s.createDataFrame(rows).toDF("token", "est_cnt")
  }

  /** Corpus length-distribution quantiles via PERSISTABLE per-source KLL
    * sketches: one row per source with estimated p10/p50/p90/p99 of the
    * document character-length distribution, plus the "__all__" row whose
    * sketch is the MERGE of the per-source binaries — rank queries over
    * the whole corpus answered from roll-up state, never a global sort or
    * rescan (the length histogram every dataset card reports, kept
    * incremental). KLL at k=200 bounds single-sided rank error at ~1.65%
    * for any distribution; per-group state is a few KB, map-side combined
    * (functions/Kll.scala). [rows]: estimates are sketch-specific
    * (SketchSpec bounds every reported value's true rank against the
    * target fraction, per source and for the merged row). */
  def qDocLenQuantiles(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Kll._
    val fracs = Array(0.10, 0.50, 0.90, 0.99)
    val perSource = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(kllAgg(col("n_chars").cast("double")).as("sk"),
        count(lit(1)).as("n_docs"))
    val union = perSource
      .agg(kllMergeAgg(col("sk")).as("sk"), sum(col("n_docs")).as("n_docs"))
      .select(lit("__all__").as("source"), col("sk"), col("n_docs"))
    perSource.unionByName(union)
      .select(col("source"), col("n_docs"),
        kllQuantiles(col("sk"), fracs).as("qs"))
      .select(col("source"), col("n_docs"),
        col("qs").getItem(0).as("p10"), col("qs").getItem(1).as("p50"),
        col("qs").getItem(2).as("p90"), col("qs").getItem(3).as("p99"))
      .orderBy(col("source"))
  }

  /** Distinct-document estimation via PERSISTABLE per-source HLL
    * sketches: one sketch row per source (distinct normalized texts) plus
    * the lossless union of all sources ("__all__") — computed by MERGING
    * the per-source register arrays, never re-scanning the corpus (the
    * roll-up property). Estimates ride datasketches HLL (lgK 14 ≈ 0.8%
    * RSE, spec-bounded vs exact). [rows]. */
  def qDocDistinctSketch(s: SparkSession, d: String): DataFrame = {
    val perSource = Tables.documents(s, d)
      .select(col("source"), md5(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("h"), lit(14)).as("sk"))
    val union = perSource
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(lit("__all__").as("source"), col("sk"))
    perSource.select(col("source"), col("sk"))
      .unionByName(union)
      .select(col("source"),
        hll_sketch_estimate(col("sk")).as("est_distinct"))
  }

  /** ORACLE-ABLE KLL check — the sketch ESTIMATES are engine-specific
    * ([[qDocLenQuantiles]] stays [rows]), but the sketch's RANK BOUND is
    * a theorem both engines can verify exactly: for every per-source and
    * merged estimate, the exact mass strictly below it must not exceed
    * frac+eps and the mass at-or-below must reach frac-eps (the
    * SketchSpec two-sided tie-robust bound, eps = 2.5% at k = 200,
    * integer-scaled so no division is ever compared). One melt of the
    * sketch output + ONE conditional-count pass over (source, n_chars)
    * per frac — bounded at (sources+1) x 4 output rows. The DuckDB
    * oracle is the materialized truth relation (all-true): a sketch
    * violating its bound flips a boolean and hash-mismatches. */
  def qDocLenCheck(s: SparkSession, d: String): DataFrame = {
    val epsBp = 250L // 2.5% in basis points (the SketchSpec bound)
    val fracsBp = Seq(1000L, 5000L, 9000L, 9900L)
    val est = qDocLenQuantiles(s, d)
      .select(col("source"), col("n_docs"), expr(
        """stack(4, 1000L, p10, 5000L, p50, 9000L, p90, 9900L, p99)
          | AS (frac_bp, est)""".stripMargin))
    val docs = Tables.documents(s, d)
      .select(col("source"), col("n_chars").cast("double").as("len"))
    val all = docs.withColumn("source", lit("__all__"))
    val ranks = docs.unionByName(all)
      .join(est, Seq("source"))
      .groupBy(col("source"), col("frac_bp"), col("est"))
      .agg(count(when(col("len") < col("est"), 1)).as("n_lt"),
        count(when(col("len") <= col("est"), 1)).as("n_le"),
        count(lit(1)).as("n"))
    ranks.select(col("source"), (col("frac_bp") / 100).cast("int").as("pct"),
        (col("n_lt") * 10000L <= col("n") * (col("frac_bp") + epsBp)
          && col("n_le") * 10000L >= col("n") * (col("frac_bp") - epsBp))
          .as("within_bound"))
      .orderBy(col("source"), col("pct"))
  }

  /** DuckDB mirror of [[qDocLenCheck]]: the truth relation the bound
    * guarantees — one all-true row per (source incl. __all__, frac). */
  def qDocLenCheckSql: String =
    """WITH srcs AS (SELECT DISTINCT source FROM documents
      | UNION ALL SELECT '__all__')
      |SELECT source, CAST(f.pct AS INT) AS pct, TRUE AS within_bound
      |FROM srcs, (SELECT unnest([10, 50, 90, 99]) AS pct) f""".stripMargin
}
