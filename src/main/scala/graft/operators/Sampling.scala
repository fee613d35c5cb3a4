package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic corpus sampling — the split/mix stage of a training-data
  * pipeline (cf. reference `run/run_iceberg_daq.sh:158,169`, which pins
  * each detector stream to a FIXED partition number: membership must be a
  * pure function of the record's identity, never of execution order).
  *
  * Both operators key every decision on a salted md5 of the document id,
  * compared lexicographically against a fixed 4-hex-digit cutoff:
  *
  *   keep(doc) = substr(md5(salt || doc_id), 1, 4) < cutoff(fraction)
  *
  * where `cutoff(f)` is `floor(f * 16^4)` rendered as zero-padded
  * lowercase hex (`"g"` for f >= 1.0 — every hex string sorts below it).
  * This form is engine-portable by construction: Spark and DuckDB produce
  * identical lowercase-hex md5 over identical UTF-8 bytes, and ASCII hex
  * compares identically under both engines' binary collations — so the
  * assignment is oracle-checkable, reproducible across runs, clusters and
  * engines, and stable under repartitioning (no rand(), no row order
  * dependence, no per-partition seeds).
  *
  * Scale shape (100 TB): assignment is a narrow per-row projection fused
  * into the scan (zero shuffle, whole-stage codegen over the built-in
  * md5/substr/CASE expressions); the only exchange is the final
  * tiny-cardinality aggregate (#sources × #splits rows). Reading only
  * (doc_id, source, n_chars) — the `text` column is never touched, so
  * the scan is a few percent of the table's bytes.
  */
object Sampling {

  /** 4-hex-digit lexicographic cutoff for a keep-fraction in [0, 1]. */
  private[graft] def hexCutoff(f: Double): String = {
    val n = math.floor(f * 65536.0).toLong
    if (n >= 65536L) "g" // sorts above every [0-9a-f]{4} string
    else if (n <= 0L) "0000" // nothing sorts below "0000": keep-none
    else f"$n%04x"
  }

  private def saltedHash4(salt: String): Column =
    substring(md5(concat(lit(salt), col("doc_id").cast("string"))), 1, 4)

  private def saltedHash4Sql(salt: String): String =
    s"substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 1, 4)"

  // -------------------------------------------------------------------
  // q_doc_split — deterministic train/val/test assignment (80/10/10)
  // -------------------------------------------------------------------

  /** Split salt: distinct from the mix salt so the two decisions are
    * independent hash draws (a doc sampled out of the mixture still has a
    * well-defined split, and vice versa). */
  private val SplitSalt = "split1:"
  private val TrainCut = hexCutoff(0.80) // "cccc"
  private val ValCut = hexCutoff(0.90) // "e666"

  /** The split label as a COLUMN over any frame with `doc_id` — exposed
    * so pipeline stages (curate → split → pack) reuse the exact same
    * deterministic assignment the census query reports on. */
  def splitCol: Column = {
    val h = saltedHash4(SplitSalt)
    when(h < lit(TrainCut), lit("train"))
      .when(h < lit(ValCut), lit("val"))
      .otherwise(lit("test"))
  }

  /** The mixture keep-decision as a COLUMN over any frame with `doc_id`
    * and `source` (same policy the census query reports on). */
  def mixKeepCol: Column = {
    val cut = MixPolicy.foldRight(lit(hexCutoff(MixDefault)): Column) {
      case ((src, f), acc) =>
        when(col("source") === lit(src), lit(hexCutoff(f))).otherwise(acc)
    }
    saltedHash4(MixSalt) < cut
  }

  /** Per-(source, split) census of the deterministic 80/10/10 assignment:
    * every document lands in exactly one split, decided solely by
    * md5(salt || doc_id) — adding data, reordering files, or changing
    * parallelism never moves an existing document between splits. */
  def qDocSplit(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(
        col("source"),
        splitCol.as("split"),
        col("n_chars"))
      .groupBy("source", "split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"))
  }

  def qDocSplitSql: String = {
    val h = saltedHash4Sql(SplitSalt)
    s"""SELECT source,
       | CASE WHEN $h < '$TrainCut' THEN 'train'
       |      WHEN $h < '$ValCut' THEN 'val'
       |      ELSE 'test' END AS split,
       | CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(n_chars) AS BIGINT) AS n_chars
       |FROM documents
       |GROUP BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------------
  // q_doc_mix — weighted domain mixing (per-source keep fractions)
  // -------------------------------------------------------------------

  private val MixSalt = "mix1:"

  /** Mixture policy: per-source target keep-fraction, with a default for
    * sources the policy doesn't name. Declared ONCE here and rendered into
    * both the Spark plan and the oracle SQL, so the two can't drift. */
  private[graft] val MixPolicy: Seq[(String, Double)] = Seq(
    "src0" -> 0.10, // noisy-crawl tier: heavy downsample
    "src1" -> 0.25,
    "src2" -> 0.50,
    "src3" -> 0.50,
    "src4" -> 0.75)
  private[graft] val MixDefault = 1.0 // curated tier: keep all

  /** Per-source effect of the mixture policy in one scan: total documents,
    * kept documents/chars under the deterministic per-source keep
    * fraction, and the achieved rate. The keep decision is the same
    * salted-hash draw as the split, under a different salt; the per-source
    * cutoff is resolved by a CASE over the bounded policy list (a literal
    * expression — no join, nothing broadcast). */
  def qDocMix(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("source"), col("n_chars"), mixKeepCol.as("keep"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        sum(when(col("keep"), col("n_chars")).otherwise(lit(0L)))
          .as("kept_chars"))
      .withColumn("achieved_rate",
        expr("CAST(n_kept AS DOUBLE) / CAST(n_total AS DOUBLE)"))
  }

  def qDocMixSql: String = {
    val arms = MixPolicy.map { case (src, f) =>
      s"WHEN source = '$src' THEN '${hexCutoff(f)}'"
    }.mkString("\n |      ")
    val h = saltedHash4Sql(MixSalt)
    s"""SELECT source, n_total, n_kept, kept_chars,
       | CAST(n_kept AS DOUBLE) / CAST(n_total AS DOUBLE) AS achieved_rate
       |FROM (
       |  SELECT source,
       |   CAST(count(*) AS BIGINT) AS n_total,
       |   CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |   CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
       |     AS kept_chars
       |  FROM (
       |    SELECT source, n_chars,
       |     $h < CASE
       |      $arms
       |      ELSE '${hexCutoff(MixDefault)}' END AS keep
       |    FROM documents
       |  )
       |  GROUP BY source
       |)""".stripMargin
  }

  // -------------------------------------------------------------------
  // q_doc_curriculum — quality-curriculum sampling + epoch upsampling
  // (the data-mixing recipe modern pretraining runs: high-quality docs
  // are kept whole and seen for SEVERAL epochs, mid-tier is downsampled,
  // junk is heavily cut). Tier assignment is pure INTEGER comparisons
  // over token counts (cross-engine exact); keep decisions are the same
  // salted-hash draw as split/mix under a curriculum salt; upsampling is
  // a per-tier epoch constant. Everything is a pure function of
  // (doc_id, text) — reproducible across runs, engines and partitioning.
  // -------------------------------------------------------------------

  private val CurrSalt = "curr1:"

  /** (keep fraction, training epochs) per quality tier — declared once,
    * rendered into both the Spark plan and the oracle SQL. */
  private[graft] val CurriculumPolicy: Seq[(String, (Double, Int))] = Seq(
    "high" -> (1.0, 3), // diverse, long enough: keep all, 3 epochs
    "mid" -> (0.5, 1),
    "low" -> (0.1, 1)) // short/repetitive tier: heavy cut

  /** Quality tier from integer token statistics (the q_corpus_card
    * quality rule, stratified): diverse long docs are "high", long but
    * repetitive are "mid", short docs are "low". Expects `n_tokens` and
    * `n_distinct` columns. */
  private def tierCol: Column =
    when(col("n_tokens") >= 12 && col("n_distinct") * 2 >= col("n_tokens"),
      lit("high"))
      .when(col("n_tokens") >= 12, lit("mid"))
      .otherwise(lit("low"))

  private def epochsCol: Column =
    CurriculumPolicy.foldRight(lit(1): Column) { case ((t, (_, e)), acc) =>
      when(col("tier") === lit(t), lit(e)).otherwise(acc)
    }

  private def currKeepCol: Column = {
    val cut = CurriculumPolicy.foldRight(lit("g"): Column) {
      case ((t, (f, _)), acc) =>
        when(col("tier") === lit(t), lit(hexCutoff(f))).otherwise(acc)
    }
    saltedHash4(CurrSalt) < cut
  }

  private def withTier(docs: DataFrame): DataFrame = docs
    .withColumn("toks", graft.operators.TextOps.tokens(col("text")))
    .withColumn("n_tokens", size(col("toks")))
    .withColumn("n_distinct", size(array_distinct(col("toks"))))
    .withColumn("tier", tierCol)

  /** The actual TRAINING-STREAM relation: one row per (kept doc, epoch)
    * — kept docs replicate `epochs(tier)` times with an epoch stamp
    * (explode of a ≤3-element sequence: narrow, no shuffle; the stream
    * feeds Pipeline.pack downstream). */
  def curriculumExamples(docs: DataFrame): DataFrame =
    withTier(docs)
      .filter(currKeepCol)
      .select(col("doc_id"), col("source"), col("tier"), col("n_chars"),
        explode(sequence(lit(1), epochsCol)).as("epoch"))

  /** Census of the curriculum policy in ONE scan-shaped pass (no
    * explode — n_examples folds as n_kept × epochs, a per-tier
    * constant; SamplingSpec proves the census ≡ the exploded stream):
    * per (source, tier) totals, kept counts/chars, training examples,
    * achieved rate. Output bounded at sources × 3. */
  def qDocCurriculum(s: SparkSession, d: String): DataFrame = {
    withTier(Tables.documents(s, d))
      .select(col("source"), col("tier"), col("n_chars"),
        currKeepCol.as("keep"), epochsCol.as("epochs"))
      .groupBy(col("source"), col("tier"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("epochs").cast("long")).otherwise(0L))
          .as("n_examples"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("kept_chars"))
  }

  def qDocCurriculumSql: String = {
    val h = saltedHash4Sql(CurrSalt)
    val cutArms = CurriculumPolicy.map { case (t, (f, _)) =>
      s"WHEN tier = '$t' THEN '${hexCutoff(f)}'"
    }.mkString(" ")
    val epochArms = CurriculumPolicy.map { case (t, (_, e)) =>
      s"WHEN tier = '$t' THEN $e"
    }.mkString(" ")
    s"""SELECT source, tier,
       | CAST(count(*) AS BIGINT) AS n_total,
       | CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       | CAST(sum(CASE WHEN keep THEN epochs ELSE 0 END) AS BIGINT)
       |   AS n_examples,
       | CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
       |   AS kept_chars
       |FROM (
       | SELECT source, n_chars,
       |  $h < CASE $cutArms ELSE 'g' END AS keep,
       |  CASE $epochArms ELSE 1 END AS epochs, tier
       | FROM (
       |  SELECT doc_id, source, n_chars,
       |   CASE WHEN n_tokens >= 12 AND 2 * n_distinct >= n_tokens
       |     THEN 'high'
       |    WHEN n_tokens >= 12 THEN 'mid' ELSE 'low' END AS tier
       |  FROM (
       |   SELECT doc_id, source, n_chars,
       |    CAST(len(toks) AS INT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS INT) AS n_distinct
       |   FROM (SELECT doc_id, source, n_chars,
       |     regexp_split_to_array(trim(text), ' +') AS toks
       |    FROM documents) a) b) c)
       |GROUP BY 1, 2""".stripMargin
  }

  // --------------------------------------------------------------- DSIR

  /** Feature-model vocabulary bound (top-V by raw count + one OOV
    * bucket). The published method hashes features into 10k buckets to
    * bound model size; an explicit top-V cut plays the same
    * bounded-memory role (V+1 rows broadcast anywhere) and — unlike a
    * hash — is exactly replayable in oracle SQL. */
  val DsirV = 4096

  /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much more likely its unigram+bigram feature stream
    * is under a TARGET domain's bag-of-features model than under the raw
    * corpus's own model, and keep the docs whose importance weight
    * exceeds 1. The target here is the `lang = 'en'` slice (the "domain
    * sample" role the paper fills with Wikipedia+books). Both models are
    * add-1-smoothed multinomials over the SAME top-V + OOV buckets.
    *
    * Exactness discipline (cross-engine hash parity): each feature's
    * log-ratio quantizes ONCE into a scaled BIGINT,
    *   L_f = floor(1e6 · ln((tgt_f + 1) / (raw_f + 1))),
    * with the normalizer folded into a per-feature constant
    *   L0 = floor(1e6 · ln((N_raw + V') / (N_tgt + V'))),
    * so a per-doc score is an exact integer sum Σ (L_f + L0) — never a
    * float accumulation whose ordering could diverge between engines.
    * The only floats are the V'+1 distinct ln() calls, each quantized
    * identically by both engines (a divergence needs the true value
    * within ~1e-9 of the 1e-6 grid; the tgt_f = raw_f boundary case is
    * ln 1 = 0, exact in both). `selected = score > 0` is the
    * importance-weight-above-1 keep decision.
    *
    * Scale shape (100 TB): the feature stream explodes in-place from the
    * scan (built-in split/transform — no UDF; bigrams come from the
    * MATERIALIZED token array, never a re-evaluated lambda split); the
    * model is one map-side-combined groupBy of that stream cut to V rows
    * by a bounded TakeOrdered; scoring joins the stream against the
    * V+1-row model (broadcast by size, hint-free) and re-aggregates per
    * doc — the only corpus-sized shuffle carries (doc_id, long) partial
    * sums, never text. ONE scan pass (r14): per-(doc, feature) counts
    * materialize once and feed model, totals, and scoring — the raw
    * corpus is never re-read. */
  def qDocDsir(s: SparkSession, d: String): DataFrame =
    dsirScores(Tables.documents(s, d), col("lang") === "en", DsirV)

  /** Core of [[qDocDsir]], parametric in the target predicate and the
    * vocabulary bound so the spec can plant a tiny corpus and force the
    * OOV bucket (the sf corpora fit entirely inside DsirV). `docs` needs
    * (doc_id, text) plus whatever `isTarget` reads. */
  private[graft] def dsirScores(docs: DataFrame, isTarget: Column,
      v: Int): DataFrame = {
    // ONE corpus pass (the r13 verdict's fold-the-passes ask): tokenize →
    // explode → per-(doc, feature) counts, map-side combined, materialized
    // once. Model counts, totals, AND per-doc scoring all derive from this
    // frame — the raw corpus is never re-scanned or re-exploded. The
    // checkpoint is (doc, distinct-feature)-sized — the same order as the
    // shuffle the old second pass paid, minus the repeat scan.
    val docFeat = docs
      .select(col("doc_id"), isTarget.as("__tgt"),
        TextOps.tokens(col("text")).as("t"))
      // Spark's sequence(1, 0) counts DOWN (it is not empty) — guard the
      // single-token doc explicitly
      .withColumn("feats", concat(col("t"),
        when(size(col("t")) >= 2,
          transform(sequence(lit(1), size(col("t")) - 1),
            i => concat(element_at(col("t"), i), lit(" "),
              element_at(col("t"), i + 1))))
          .otherwise(array())))
      .select(col("doc_id"), col("__tgt"), explode(col("feats")).as("f"))
      .groupBy(col("doc_id"), col("__tgt"), col("f"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val isTgt = col("__tgt")
    // feature-count model: a second-level agg over docFeat
    // (feature-space-sized result; a 100 TB corpus with an unbounded
    // bigram space would hash features first and keep this bounded)
    val counts = docFeat.groupBy(col("f")).agg(
      sum(col("c")).as("raw_c"),
      sum(when(isTgt, col("c")).otherwise(lit(0L))).as("tgt_c"))
      .localCheckpoint()
    // top-V vocabulary — bounded global cut, ties on the feature string
    // (binary collation in both engines on this ASCII corpus)
    val vocab = counts.orderBy(col("raw_c").desc, col("f")).limit(v)
      .localCheckpoint() // ≤ V rows; feeds the stats row and the join
    val tot = counts.agg(sum(col("raw_c")), sum(col("tgt_c"))).head()
    val (nRaw, nTgt) = (tot.getLong(0), tot.getLong(1))
    val vs = vocab.agg(sum(col("raw_c")), sum(col("tgt_c")),
      count(lit(1))).head()
    val (vRaw, vTgt, vp) = (vs.getLong(0), vs.getLong(1), vs.getLong(2) + 1)
    def lq(a: Long, b: Long): Long =
      math.floor(1e6 * math.log(a.toDouble / b.toDouble)).toLong
    val l0 = lq(nRaw + vp, nTgt + vp)
    val lOov = lq(nTgt - vTgt + 1, nRaw - vRaw + 1)
    val lf = vocab.select(col("f"),
      floor(lit(1e6) * log((col("tgt_c") + 1).cast("double") /
        (col("raw_c") + 1))).cast("long").as("lf"))
    docFeat.join(lf, Seq("f"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_feat"),
        sum(col("c") * (coalesce(col("lf"), lit(lOov)) + lit(l0)))
          .cast("long").as("score_scaled"))
      .select(col("doc_id"), col("n_feat"), col("score_scaled"),
        (col("score_scaled") > 0).as("selected"))
  }

  def qDocDsirSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, lang, regexp_split_to_array(trim(text), ' +') AS t
       |  FROM documents
       |), feats AS (
       |  SELECT doc_id, lang, unnest(t) AS f FROM base
       |  UNION ALL
       |  SELECT doc_id, lang, t[i] || ' ' || t[i + 1] AS f
       |  FROM (SELECT doc_id, lang, t,
       |          unnest(generate_series(1, len(t) - 1)) AS i
       |        FROM base) b
       |), counts AS (
       |  SELECT f, CAST(count(*) AS BIGINT) AS raw_c,
       |    CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS tgt_c
       |  FROM feats GROUP BY f
       |), vocab AS (
       |  SELECT f, raw_c, tgt_c FROM counts ORDER BY raw_c DESC, f
       |  LIMIT $DsirV
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_raw,
       |    CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS n_tgt
       |  FROM feats
       |), vs AS (
       |  SELECT CAST(sum(raw_c) AS BIGINT) AS v_raw,
       |    CAST(sum(tgt_c) AS BIGINT) AS v_tgt,
       |    CAST(count(*) AS BIGINT) + 1 AS vp
       |  FROM vocab
       |), consts AS (
       |  SELECT CAST(floor(CAST(1000000 AS DOUBLE)
       |      * ln(CAST(n_raw + vp AS DOUBLE) / (n_tgt + vp))) AS BIGINT)
       |      AS l0,
       |    CAST(floor(CAST(1000000 AS DOUBLE)
       |      * ln(CAST(n_tgt - v_tgt + 1 AS DOUBLE) / (n_raw - v_raw + 1)))
       |      AS BIGINT) AS l_oov
       |  FROM tot, vs
       |), lf AS (
       |  SELECT f, CAST(floor(CAST(1000000 AS DOUBLE)
       |    * ln(CAST(tgt_c + 1 AS DOUBLE) / (raw_c + 1))) AS BIGINT) AS lf
       |  FROM vocab
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
       |  CAST(sum(COALESCE(lf.lf, consts.l_oov) + consts.l0) AS BIGINT)
       |    AS score_scaled,
       |  CAST(sum(COALESCE(lf.lf, consts.l_oov) + consts.l0) AS BIGINT) > 0
       |    AS selected
       |FROM feats LEFT JOIN lf USING (f) CROSS JOIN consts
       |GROUP BY doc_id""".stripMargin

  /** TEMPERATURE-SCALED SOURCE SAMPLING (the multilingual-mixing rule
    * of mT5 / XLM-R: sample source s with probability ∝ n_s^α, α < 1,
    * upweighting tails without UniMax's hard cap; α = 1/2 here — the
    * one exponent computable EXACTLY cross-engine, because IEEE sqrt
    * is correctly rounded in both engines where pow is not): per
    * source, weight w_s = floor(1e6·sqrt(n_s)) (one quantization of a
    * correctly-rounded double — the DSIR grid argument), allocation
    * b_s = B·w_s div Σw with the remainder going +1 to the first r
    * sources in (w desc, source) order — all integer, no float ever
    * divides. B = 2/5 of corpus tokens (the UniMax budget, so the two
    * samplers read side by side).
    *
    * Scale: ONE corpus scan to #sources rows; window math on the
    * bounded frame (the KB-frame exception). B·w products run in
    * DECIMAL(38,0)/HUGEINT (the q_evt_lttb width rule). */
  def qDocTemperature(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.documents(s, d)
      .select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
    val wAll = Window.partitionBy()
    val wRn = Window.orderBy(col("w").desc, col("source"))
    per
      .withColumn("w",
        floor(lit(1e6) * sqrt(col("n_tokens").cast("double"))).cast("long"))
      .withColumn("sw", sum(col("w")).over(wAll))
      .withColumn("budget",
        expr(s"sum(n_tokens) OVER () * $UnimaxBudgetNum DIV $UnimaxBudgetDen"))
      .withColumn("i", row_number().over(wRn).cast("long"))
      .withColumn("base", expr(
        "CAST(CAST(budget AS DECIMAL(38,0)) * w DIV sw AS BIGINT)"))
      // deterministic integerization: budget − Σ base leftover tokens go
      // +1 to the first r sources in (w desc, source) order
      .withColumn("leftover",
        col("budget") - sum(col("base")).over(wAll))
      .withColumn("alloc_tokens",
        col("base") + when(col("i") <= col("leftover"), 1L).otherwise(0L))
      .select(col("source"), col("n_tokens"), col("w").as("weight_scaled"),
        col("alloc_tokens"),
        (col("alloc_tokens").cast("double") /
          col("n_tokens").cast("double")).as("epochs_alloc"))
  }

  def qDocTemperatureSql: String =
    s"""WITH per AS (
       |  SELECT source,
       |    CAST(sum(len(regexp_split_to_array(trim(text), ' +')))
       |      AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source
       |), f AS (
       |  SELECT source, n_tokens,
       |    CAST(floor(1e6 * sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w,
       |    CAST(sum(CAST(floor(1e6 * sqrt(CAST(n_tokens AS DOUBLE)))
       |      AS BIGINT)) OVER () AS BIGINT) AS sw,
       |    CAST((sum(n_tokens) OVER ()) * $UnimaxBudgetNum
       |      // $UnimaxBudgetDen AS BIGINT) AS budget
       |  FROM per
       |), g AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY w DESC, source)
       |      AS BIGINT) AS i,
       |    CAST(CAST(budget AS HUGEINT) * w // sw AS BIGINT) AS base
       |  FROM f
       |), h AS (
       |  SELECT *, budget - CAST(sum(base) OVER () AS BIGINT) AS leftover
       |  FROM g
       |)
       |SELECT source, n_tokens, w AS weight_scaled,
       |  CAST(base + CASE WHEN i <= leftover THEN 1 ELSE 0 END AS BIGINT)
       |    AS alloc_tokens,
       |  CAST(base + CASE WHEN i <= leftover THEN 1 ELSE 0 END AS DOUBLE)
       |    / n_tokens AS epochs_alloc
       |FROM h""".stripMargin

  /** UniMax epoch cap and budget fraction (numerator/denominator of the
    * total-token budget — integer math end to end). */
  val UnimaxEpochCap = 2L
  val UnimaxBudgetNum = 2L
  val UnimaxBudgetDen = 5L

  /** UNIMAX SOURCE-BUDGET ALLOCATION (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): distribute a total token budget
    * (2/5 of the corpus here) across sources as uniformly as possible
    * subject to a per-source epoch cap (≤ [[UnimaxEpochCap]] passes
    * over each source) — the published fix for both
    * proportional-sampling's head-domination and uniform-sampling's
    * tail over-epoching.
    *
    * The sequential water-filling greedy collapses to a CLOSED FORM
    * both engines compute exactly: sort sources by cap ascending; a
    * source is CAPPED iff cap_i·(m−i+1) ≤ B − prefix_{i−1} (the capped
    * set is a prefix of the sort — proven monotone since caps ascend);
    * the remaining budget levels uniformly over the m−t uncapped
    * sources via integer division, with the remainder going +1 to the
    * first r uncapped sources in sort order (the deterministic
    * integerization, documented in-line). Every quantity is an exact
    * BIGINT; the only double is the reported epochs ratio.
    *
    * Scale shape: ONE corpus scan folds token counts to #sources rows;
    * all window math runs on that bounded frame (the documented
    * KB-frame exception to the no-global-window rule). */
  def qDocUnimax(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.documents(s, d)
      .select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
    // bounded (#sources) frame from here on
    val wOrd = Window.orderBy(col("cap_tokens"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRn = Window.orderBy(col("cap_tokens"), col("source"))
    val wAll = Window.partitionBy()
    val f = per
      .withColumn("cap_tokens", col("n_tokens") * lit(UnimaxEpochCap))
      .withColumn("i", row_number().over(wRn).cast("long"))
      .withColumn("prefix", sum(col("cap_tokens")).over(wOrd))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("budget",
        expr(s"sum(n_tokens) OVER () * $UnimaxBudgetNum DIV $UnimaxBudgetDen"))
      .withColumn("capped",
        col("cap_tokens") * (col("m") - col("i") + 1) <=
          col("budget") - (col("prefix") - col("cap_tokens")))
      .withColumn("t",
        coalesce(max(when(col("capped"), col("i"))).over(wAll), lit(0L)))
      .withColumn("pt",
        coalesce(max(when(col("capped"), col("prefix"))).over(wAll), lit(0L)))
    f.withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens"))
          .otherwise(expr("(budget - pt) DIV (m - t)") +
            when(col("i") - col("t") <= expr("(budget - pt) % (m - t)"),
              lit(1L)).otherwise(lit(0L))))
      .select(col("source"), col("n_tokens"), col("cap_tokens"),
        col("alloc_tokens").cast("long").as("alloc_tokens"),
        (col("alloc_tokens").cast("double") /
          col("n_tokens").cast("double")).as("epochs_alloc"))
  }

  def qDocUnimaxSql: String =
    s"""WITH per AS (
       |  SELECT source,
       |    CAST(sum(len(regexp_split_to_array(trim(text), ' +')))
       |      AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source
       |), f AS (
       |  SELECT source, n_tokens,
       |    n_tokens * $UnimaxEpochCap AS cap_tokens,
       |    CAST(row_number() OVER (
       |      ORDER BY n_tokens * $UnimaxEpochCap, source) AS BIGINT) AS i,
       |    CAST(sum(n_tokens * $UnimaxEpochCap) OVER (
       |      ORDER BY n_tokens * $UnimaxEpochCap, source
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix,
       |    CAST(count(*) OVER () AS BIGINT) AS m,
       |    CAST((sum(n_tokens) OVER ()) * $UnimaxBudgetNum
       |      // $UnimaxBudgetDen AS BIGINT) AS budget
       |  FROM per
       |), g AS (
       |  SELECT *, cap_tokens * (m - i + 1)
       |    <= budget - (prefix - cap_tokens) AS capped
       |  FROM f
       |), h AS (
       |  SELECT *,
       |    COALESCE(max(CASE WHEN capped THEN i END) OVER (), 0) AS t,
       |    COALESCE(max(CASE WHEN capped THEN prefix END) OVER (), 0) AS pt
       |  FROM g
       |)
       |SELECT source, n_tokens, cap_tokens,
       |  CAST(CASE WHEN capped THEN cap_tokens
       |    ELSE (budget - pt) // (m - t)
       |      + CASE WHEN i - t <= (budget - pt) % (m - t)
       |        THEN 1 ELSE 0 END END AS BIGINT) AS alloc_tokens,
       |  CAST(CASE WHEN capped THEN cap_tokens
       |    ELSE (budget - pt) // (m - t)
       |      + CASE WHEN i - t <= (budget - pt) % (m - t)
       |        THEN 1 ELSE 0 END END AS DOUBLE) / n_tokens
       |    AS epochs_alloc
       |FROM h""".stripMargin
}
