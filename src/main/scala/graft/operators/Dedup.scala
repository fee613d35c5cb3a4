package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.D — the deduplication family over `documents`.
  *
  * Scale posture: exact dedup is a hash-groupBy (one shuffle on the digest —
  * the only O(n) exact option at 100 TB). Near-dup never goes O(n²): MinHash
  * and SimHash generate candidates via LSH banding (groupBy on band keys →
  * within-bucket pairs only), then verify candidates exactly. The brute
  * kernels here (probe-Jaccard, within-label cosine) are correctness
  * baselines and oracle anchors.
  */
object Dedup {

  /** Exact dedup: md5 digest groupBy, keep the smallest doc_id per digest.
    * (cf. the reference's per-file adler32 integrity digests,
    * file_transfer_scripts/insert_extra_fields.py). */
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))

  def qDedupExactSql: String =
    """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** Token-set Jaccard similarity of every document against a probe doc
    * (doc_id=0) — the exact kernel that MinHash approximates. Integer
    * set-size ratios → bit-identical doubles on any engine. */
  def qDedupJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("toks", array_distinct(TextOps.tokens(col("text"))))
    val probe = docs.filter(col("doc_id") === 0)
      .select(col("toks").as("probe_toks"))
    docs.crossJoin(broadcast(probe))
      .select(col("doc_id"),
        (size(array_intersect(col("toks"), col("probe_toks"))).cast("double") /
          size(array_union(col("toks"), col("probe_toks")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  def qDedupJaccardSql: String =
    """WITH t AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), ' +')) AS toks FROM documents),
      |probe AS (SELECT toks AS probe_toks FROM t WHERE doc_id = 0)
      |SELECT doc_id,
      | CAST(len(list_intersect(toks, probe_toks)) AS DOUBLE) / len(list_distinct(list_concat(toks, probe_toks))) AS jaccard
      |FROM t, probe
      |WHERE CAST(len(list_intersect(toks, probe_toks)) AS DOUBLE) / len(list_distinct(list_concat(toks, probe_toks))) >= 0.5""".stripMargin

  /** Embedding-cosine near-dup pairs, bucketed by label (stand-in for the
    * LSH bucket at oracle time) — only within-bucket pairs are scored, the
    * shape the 100 TB path requires. Output is int ids only (threshold on
    * cosine, never hash-compared as a float). */
  def qDedupEmbed(s: SparkSession, d: String): DataFrame = {
    // norms are computed ONCE per vector before the pair join (the join
    // output is quadratic in bucket size; per-pair work must be one dot)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), Similarity.asDouble(col("embedding")).as("vec"))
      .withColumn("nrm", Similarity.norm(col("vec")))
    val a = e.select(col("vec_id").as("vec_a"), col("label"),
      col("vec").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"),
      col("vec").as("vb"), col("nrm").as("nb"))
    a.join(b, "label")
      .filter(col("vec_a") < col("vec_b"))
      .filter(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("label"))
  }

  def qDedupEmbedSql: String =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label
      |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4""".stripMargin

  // ---------------------------------------------------------------- MinHash

  /** Number of MinHash hash functions (signature length). */
  val MinhashK = 16
  /** LSH bands (MinhashK / BandRows rows per band). */
  val BandRows = 4
  val NumBands: Int = MinhashK / BandRows

  /** MinHash signature as an array column computed by the native one-pass
    * codegen expression (graft.functions.MinhashSigExpr). */
  private def withSignature(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", array_distinct(TextOps.tokens(col("text"))))
      .withColumn("sigs", graft.functions.GraftFunctions.minhashSig(col("text"), MinhashK))

  /** Exact Jaccard between two token-array columns, computing
    * |A∪B| = |A|+|B|-|A∩B| so only the intersection walks the arrays. */
  private def jaccardExpr(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** MinHash + LSH-banding dedup, emitting per-document DECISIONS
    * (doc_id → dup_of representative, verified jaccard) rather than the
    * all-pairs list — in a dup-heavy corpus the pair list is quadratic in
    * cluster size (this testdata has a ~2k-doc identical cluster ≈ millions
    * of pairs), while decisions stay O(n).
    *
    * Scale shape, all linear-ish:
    *  1. identical-signature groups collapse to a representative (an
    *     identical token set ⇒ identical signature, so every exact dup is
    *     caught here deterministically — verified, not assumed);
    *  2. only the ~distinct representatives enter LSH banding, so band
    *     buckets stay small even when raw dup clusters are huge;
    *  3. representative candidate pairs are verified with exact Jaccard and
    *     each rep links to its smallest verified partner (single-hop union —
    *     the standard approximation to full connected components).
    *
    * Rows-only driver check; the spec verifies decisions against
    * brute-force Jaccard. */
  def qDedupMinhash(s: SparkSession, d: String): DataFrame = {
    // 1. collapse identical-signature groups via a window min over the
    // signature key — ONE shuffle, no corpus-scaled rep join (the r2 shape
    // sort-merged two corpus-sized frames; same fix as qDedupSimhash).
    // localCheckpoint (not persist): materialized once for the multi-branch
    // plan below, lineage truncated, blocks released by the ContextCleaner.
    val withRep = withSignature(Tables.documents(s, d))
      .withColumn("sigkey", xxhash64(col("sigs")))
      .withColumn("rep_id",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("sigkey"))))
      .localCheckpoint()

    // verify member-vs-rep exactly: ONE shuffle join on rep_id (rep_toks
    // scales with the corpus — no broadcast hint; AQE may still broadcast
    // if it proves genuinely small)
    val repToks = withRep.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id").as("rep_id"), col("toks").as("rep_toks"))
    val exactLinks = withRep.filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id"), col("toks"), col("rep_id"))
      .join(repToks, "rep_id")
      .withColumn("jaccard", jaccardExpr(col("toks"), col("rep_toks")))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_id"), col("rep_id").as("dup_of"), col("jaccard"))

    // 2. LSH banding over representatives only
    val reps = withRep.filter(col("doc_id") === col("rep_id"))
      .select(Seq(col("doc_id"), col("toks")) ++
        (0 until NumBands).map { b =>
          hash(slice(col("sigs"), b * BandRows + 1, BandRows)).as(s"band_$b")
        }: _*)
    val exploded = reps.select(col("doc_id"),
      explode(array((0 until NumBands).map(b =>
        struct(lit(b).as("band"), col(s"band_$b").as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val l = exploded.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val r = exploded.select(col("band"), col("bkey"), col("doc_id").as("doc_b"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    // 3. verify rep pairs; each rep links to its smallest verified partner
    val toksA = reps.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val toksB = reps.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    val repLinks = candidates
      .join(toksA, "doc_a")
      .join(toksB, "doc_b")
      .withColumn("jaccard", jaccardExpr(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= 0.8)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min_by(struct(col("doc_a"), col("jaccard")), col("doc_a")).as("best"))
      .select(col("doc_id"), col("best.doc_a").as("dup_of"), col("best.jaccard").as("jaccard"))

    exactLinks.union(repLinks)
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("dup_of"), col("jaccard")), col("dup_of")).as("best"))
      .select(col("doc_id"), col("best.dup_of").as("dup_of"), col("best.jaccard").as("jaccard"))
  }

  /** Full transitive dup clusters from the minhash decisions. The decisions
    * form a parent FOREST (each doc has one `dup_of`, strictly smaller ⇒
    * acyclic), so connected components reduce to root-finding by pointer
    * jumping: each round replaces every parent with its grandparent —
    * O(log depth) rounds of self-equi-joins, lineage truncated per round
    * (localCheckpoint) so plans stay flat. The DataFrame-native version of
    * connected components; no GraphX/RDD API.
    * Output: (doc_id, cluster_id) where cluster_id = the component's min
    * doc_id, for every doc that appears in a decision. */
  def dupClusters(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftShim
    // the minhash decisions run with the session's normal confs (AQE on)…
    val decisions = qDedupMinhash(s, d)
      .select(col("doc_id"), col("dup_of")).localCheckpoint()
    // …then the pointer-jump loop follows the iterative-loop template
    // (Graph.connectedComponents): a DEDICATED child session (own SQLConf,
    // shared SparkContext) carries the loop-only confs — AQE off + shuffle
    // width scaled to the frame — so they can never leak to concurrent
    // queries on the caller's session. ONE materialization + one
    // convergence count per round. Min-hop forests are shallow, so
    // convergence (2-4 rounds) beats the former fixed ceil(log2 n) =
    // 13-round schedule.
    val loopSession = s.newSession()
    val partsWas = s.conf.get("spark.sql.shuffle.partitions")
    loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    var parent = GraftShim.ofRows(loopSession, GraftShim.logicalPlan(decisions))
    val n = parent.count()
    loopSession.conf.set("spark.sql.shuffle.partitions",
      math.max(1L, math.min(partsWas.toLong, n / 1000000L + 1L)).toString)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < 64) {
      val grand = parent.select(col("doc_id").as("p_doc"), col("dup_of").as("p_par"))
      val next = parent
        .join(grand, parent("dup_of") === grand("p_doc"), "left")
        .select(col("doc_id"), col("dup_of").as("old"),
          coalesce(col("p_par"), col("dup_of")).as("dup_of"))
        .localCheckpoint()
      changed = next.filter(col("dup_of") < col("old")).count() // parents only decrease
      parent = next.select(col("doc_id"), col("dup_of"))
      round += 1
    }
    // partially-jumped parents are WRONG cluster ids — fail loudly, never
    // return them (the 64-round cap is a safety net, not the driver)
    if (changed > 0)
      throw new IllegalStateException(
        s"dupClusters pointer jumping did not converge in $round rounds " +
          s"($changed parents still changing) — refusing to return partial clusters")
    // roots map to themselves
    val roots = parent.select(col("dup_of").as("doc_id")).distinct()
      .join(parent.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    val out = parent.select(col("doc_id"), col("dup_of").as("cluster_id"))
      .union(roots)
    GraftShim.ofRows(s, GraftShim.logicalPlan(out))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc via the native codegen expression
    * (graft.functions.Simhash64): a pure narrow map — no explode, no wide
    * aggregate, no shuffle. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.simhash64(col("text")).as("simhash"))

  /** SimHash near-dup dedup decisions. Same scale shape as qDedupMinhash:
    * identical-fingerprint groups collapse to a representative first (a dup
    * cluster produces O(cluster) decisions, not O(cluster²) pairs), then the
    * representatives go through chunk banding: the 64-bit fingerprint splits
    * into 4×16-bit chunks, and a rep pair within hamming ≤ 3 must agree on
    * at least one chunk (pigeonhole) → guaranteed candidates, verified via
    * bit_count(xor). Emits (doc_id, dup_of, hamming). Rows-only check; the
    * spec proves the pigeonhole guarantee against brute force. */
  def qDedupSimhash(s: SparkSession, d: String): DataFrame = {
    val fp = simhash(Tables.documents(s, d))

    // 1. collapse identical fingerprints (hamming 0 to the representative)
    // with a window min — ONE shuffle on simhash, no rep join at all (the
    // r2 rep-collapse join sort-merged two corpus-scaled sides and cost
    // 4.5x; a window computes the same rep_id in-partition).
    // localCheckpoint: materialized once for the two filter branches below.
    val withRep = fp.withColumn("rep_id",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("simhash"))))
      .localCheckpoint()
    val exactLinks = withRep.filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id"), col("rep_id").as("dup_of"), lit(0).as("hamming"))

    // 2. chunk banding over representatives only
    val reps = withRep.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("simhash"))
    val exploded = reps.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c => struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("ck"))): _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk").as("chunk"), col("cc.ck").as("ck"))
    val l = exploded.select(col("chunk"), col("ck"), col("doc_id").as("doc_a"),
      col("simhash").as("fp_a"))
    val r = exploded.select(col("chunk"), col("ck"), col("doc_id").as("doc_b"),
      col("simhash").as("fp_b"))
    val repLinks = l.join(r, Seq("chunk", "ck"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= 6)
      .distinct()
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min_by(struct(col("doc_a"), col("hamming")), col("doc_a")).as("best"))
      .select(col("doc_id"), col("best.doc_a").as("dup_of"), col("best.hamming").as("hamming"))

    exactLinks.union(repLinks)
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("dup_of"), col("hamming")), col("dup_of")).as("best"))
      .select(col("doc_id"), col("best.dup_of").as("dup_of"), col("best.hamming").as("hamming"))
  }

  // ------------------------------------------- Embedding near-dup via LSH

  /** Hyperplane LSH config for embedding NEAR-DUP bucketing. `bits` is the
    * BUCKET dial — band-key cardinality is L·2^bits, so expected bucket
    * width is n/2^bits per table — and its ceiling is set by the threshold:
    * per-bit agreement for a pair at cosine threshold θ is p = 1 − θ/π, and
    * per-pair recall is 1 − (1 − p^bits)^L. At production near-dup
    * thresholds (≥ 0.9, p ≈ 0.86) 8-16-bit bands keep recall high with
    * 256-65k-way bucketing — that is the 100 TB setting. This corpus tops
    * out at cosine ≈ 0.47, so the anchor threshold is 0.4 (p ≈ 0.63), where
    * only short bands retain recall: 4 bits × 16 tables ⇒ per-pair recall
    * ≈ 0.94 with 16-way bucketing per table. Unlike the label bucketing of
    * the oracle anchor (fixed 10-value key), the band key's cardinality is
    * a dial, not a property of the data. */
  val EmbLshTables = 16
  val EmbLshBits = 4

  /** Deterministic pseudorandom Gaussian hyperplanes (fixed seed ⇒ same
    * buckets on every executor/run; distinct seed from the ANN planes). */
  lazy val embPlanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(EmbLshTables * EmbLshBits, 64)(rnd.nextGaussian())
  }

  /** All 16 table signatures of a vector as one int-array column via the
    * native one-pass codegen kernel (graft.functions.HyperplaneSigExpr) —
    * the column formulation (64 interpreted `aggregate` dots per row) cost
    * 3.7 s of the 7 s query at sf0.1. */
  def embSignatures(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.hyperplaneSig(
      vec, embPlanes.flatten, EmbLshTables, EmbLshBits, 64)

  /** (vec_id, vec, nrm, rep_id): every vector keyed to the min vec_id of its
    * BYTE-IDENTICAL vector group (window min — one shuffle). The collapse is
    * the degenerate-corpus guard: a corpus of identical vectors lands in one
    * LSH bucket, but after collapse it contributes ONE rep, so bucket joins
    * stay sub-quadratic wherever near-dups are actual near-dups. */
  private def embWithReps(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("vec"))
      // MEASURED AND REJECTED (r6): partitioning this window by
      // (size(vec), xxhash64(vec)) instead of the full array moved
      // q_dedup_embed_lsh 5.13 → 4.96 s at sf0.1 (~3%, within run noise)
      // while introducing a hash-collision correctness caveat that would
      // need an exact-verify join at scale. The full-array key stays.
      .withColumn("rep_id",
        min(col("vec_id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec"))))
      .withColumn("nrm", Similarity.norm(col("vec")))
      .localCheckpoint() // reused: rep keys, both pair-join sides, members

  /** Verified near-dup REP pairs (cosine ≥ 0.4) found via LSH band-key
    * bucketing: candidates share a (table, signature) band key — a groupBy-
    * shaped equi-join on the band key, never an unbounded fixed-cardinality
    * bucket (the label-bucket oracle anchor qDedupEmbed joins on a 10-value
    * key: fine as an oracle, quadratic on a skewed label at scale). Bucket
    * width scales as n/2^bits per table and `EmbLshBits` is the dial.
    * Candidates are verified with the exact cosine — precision 1 by
    * construction; recall is the banding probability (spec-bounded vs the
    * exact anchor). */
  private[operators] def embLshPairs(s: SparkSession, d: String): DataFrame = {
    val e = embWithReps(s, d)
    val reps = e.filter(col("vec_id") === col("rep_id"))
      .select(col("vec_id"), col("vec"), col("nrm"))
    // narrow band-key relation — vectors do NOT travel through the explode
    val keys = reps.select(col("vec_id"),
      posexplode(embSignatures(col("vec"))).as(Seq("tbl", "sig")))
    val cands = keys.select(col("tbl"), col("sig"), col("vec_id").as("vec_a"))
      .join(keys.select(col("tbl"), col("sig"), col("vec_id").as("vec_b")),
        Seq("tbl", "sig"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct() // a pair can match in several tables; verify once
    // fetch vectors only for candidate pairs; norms precomputed per rep
    val va = reps.select(col("vec_id").as("vec_a"), col("vec").as("va"), col("nrm").as("na"))
    val vb = reps.select(col("vec_id").as("vec_b"), col("vec").as("vb"), col("nrm").as("nb"))
    cands.join(va, "vec_a").join(vb, "vec_b")
      .filter(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= 0.4)
      .select(col("vec_a"), col("vec_b"))
  }

  /** Embedding near-dup dedup DECISIONS at corpus scale (the 100 TB path;
    * qDedupEmbed stays the label-bucketed oracle anchor): byte-identical
    * vectors collapse to a rep (dup_of = rep), rep pairs come from
    * `embLshPairs`, and each rep links to its smallest verified partner —
    * decisions, not pair lists. Rows-only driver check; DedupSpec bounds
    * recall vs the exact anchor and proves precision on the pairs. */
  def qDedupEmbedLsh(s: SparkSession, d: String): DataFrame = {
    val e = embWithReps(s, d)
    val exactLinks = e.filter(col("vec_id") =!= col("rep_id"))
      .select(col("vec_id"), col("rep_id").as("dup_of"))
    val pairLinks = embLshPairs(s, d)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(min(col("vec_a")).as("dup_of"))
    exactLinks.union(pairLinks)
      .groupBy(col("vec_id"))
      .agg(min(col("dup_of")).as("dup_of"))
  }

  /** SEMANTIC dedup decisions via coarse k-means clustering — the
    * SemDeDup shape (cluster the embedding space, compare only within a
    * cluster, keep one representative per near-dup group): candidates are
    * rep pairs sharing a k-means CLUSTER — the IVF coarse quantizer's
    * persisted `assignments` table reused verbatim (built once per
    * content fingerprint, §2.E; the dedup pass pays NO extra clustering
    * cost on a corpus that already has an ANN index — the operational
    * point of SemDeDup at 100 TB). Where the LSH path's candidate recall
    * comes from random hyperplane collision probability, the semantic
    * path's comes from cluster granularity (list width ≈ n/k is the
    * dial); both verify with the exact cosine, so per-pair precision is 1
    * by construction. Byte-identical vectors collapse to a rep FIRST (the
    * corpus's duplication never inflates a cluster), each rep links to
    * its smallest verified partner — decisions, never pair lists.
    * Rows-only driver check; DedupSpec bounds recall vs the exact anchor
    * and proves per-pair precision. */
  def qDedupSemantic(s: SparkSession, d: String): DataFrame = {
    val e = embWithReps(s, d)
    val reps = e.filter(col("vec_id") === col("rep_id"))
      .select(col("vec_id"), col("vec"), col("nrm"))
    val asg = s.read.parquet(s"${Similarity.ivfIndexDir(s, d)}/assignments")
      .select(col("vec_id"), col("list_id"))
    // narrow (list, id) relation — vectors do not travel through the join
    val keys = reps.join(asg, "vec_id").select(col("list_id"), col("vec_id"))
    val cands = keys.select(col("list_id"), col("vec_id").as("vec_a"))
      .join(keys.select(col("list_id"), col("vec_id").as("vec_b")),
        Seq("list_id"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")) // one cluster per vec: no dups
    val va = reps.select(col("vec_id").as("vec_a"), col("vec").as("va"),
      col("nrm").as("na"))
    val vb = reps.select(col("vec_id").as("vec_b"), col("vec").as("vb"),
      col("nrm").as("nb"))
    val pairLinks = cands.join(va, "vec_a").join(vb, "vec_b")
      .filter(Similarity.dot(col("va"), col("vb"))
        / (col("na") * col("nb")) >= 0.4)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(min(col("vec_a")).as("dup_of"))
    val exactLinks = e.filter(col("vec_id") =!= col("rep_id"))
      .select(col("vec_id"), col("rep_id").as("dup_of"))
    exactLinks.union(pairLinks)
      .groupBy(col("vec_id"))
      .agg(min(col("dup_of")).as("dup_of"))
  }

  /** Closed-form PINNED fixture for the oracle-checked SemDeDup leg
    * (the grayRawTable discipline): 40 planted groups (sizes cycling
    * 1..5 → 120 vectors), 16 integer dims. Group centers come from a
    * NONLINEAR hash (cubing mod 97 — an affine-in-g form collapses to
    * parallel centers mod small primes; measured max inter-group cosine
    * 0.7096), members perturb the scaled center by ±1 (min intra-group
    * cosine 0.9989) — so τ = 0.9 separates with ≥0.09 margin BOTH ways
    * and no float-ulp disagreement between engines can flip a decision.
    * All values are small integers: dots and norms² are EXACT BIGINTs in
    * both engines. vec_id = g*5 + k (closed form, no enumeration
    * ordering to agree on). */
  private[graft] def semanticFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    (for {
      g <- 0 until 40
      k <- 0 to (g % 5)
    } yield {
      val v = (0 until 16).map { j =>
        val a = (g * 41 + j * 29 + 7) % 97
        ((a * a * a % 97) % 7 - 3) * 16 + ((k * 13 + j * 5) % 3) - 1
      }
      (g * 5L + k, v)
    }).toDF("vec_id", "vec")
  }

  /** ORACLE-CHECKED SemDeDup — [[qDedupSemantic]]'s sibling over the
    * pinned fixture, the q_media_hashdup model applied to the k-means
    * leg: Spark runs the REAL pipeline (seeded Lloyd clustering →
    * within-cluster candidates only → exact cosine ≥ 0.9 verify →
    * per-vector min-partner decisions) while DuckDB regenerates the
    * fixture from its closed form and BRUTE-FORCES all pairs — so hash
    * equality proves the cluster restriction lost NOTHING (no planted
    * group straddles clusters; no qualifying pair crosses one) and the
    * cosine/decision math is right, end to end. k = 8 over 40 groups:
    * clusters hold several whole groups; the verify rejects the
    * cross-group co-residents (inter cosine ≤ 0.71). */
  def qDedupSemanticPinned(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fix = semanticFixture(s)
      .withColumn("v", transform(col("vec"), x => x.cast("double")))
      .localCheckpoint() // feeds the fit AND both candidate sides
    val model = new KMeans().setK(8).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features")
      .fit(fix.withColumn("features", array_to_vector(col("v"))))
    val asg = model.transform(fix.withColumn("features",
        array_to_vector(col("v"))))
      .select(col("vec_id"), col("v"), col("prediction").as("list_id"))
    val a = asg.select(col("list_id"), col("vec_id").as("va"),
      col("v").as("xa"))
    val b = asg.select(col("list_id"), col("vec_id").as("vb"),
      col("v").as("xb"))
    val cos = Similarity.dot(col("xa"), col("xb")) /
      (sqrt(Similarity.dot(col("xa"), col("xa")))
        * sqrt(Similarity.dot(col("xb"), col("xb"))))
    a.join(b, Seq("list_id"))
      .filter(col("va") < col("vb"))
      .filter(cos >= 0.9)
      .groupBy(col("vb").as("vec_id"))
      .agg(min(col("va")).as("dup_of"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB mirror of [[qDedupSemanticPinned]]: the fixture from its
    * closed form, ALL pairs brute-forced (no clustering — that is the
    * point), integer dots/norms, min-partner decisions. */
  def qDedupSemanticPinnedSql: String =
    """WITH gk AS (
      |  SELECT g, k FROM (SELECT unnest(range(0, 40)) AS g),
      |                   (SELECT unnest(range(0, 5)) AS k)
      |  WHERE k <= g % 5),
      |vecs AS (
      |  SELECT g*5 + k AS vec_id,
      |    list_transform(range(0, 16), j ->
      |      (((((g*41 + j*29 + 7) % 97) * ((g*41 + j*29 + 7) % 97)
      |         * ((g*41 + j*29 + 7) % 97)) % 97) % 7 - 3) * 16
      |      + ((k*13 + j*5) % 3) - 1) AS v
      |  FROM gk),
      |pairs AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb,
      |    list_sum(list_transform(range(1, 17),
      |      i -> a.v[i] * b.v[i])) AS d,
      |    list_sum(list_transform(range(1, 17),
      |      i -> a.v[i] * a.v[i])) AS na2,
      |    list_sum(list_transform(range(1, 17),
      |      i -> b.v[i] * b.v[i])) AS nb2
      |  FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id)
      |SELECT vb AS vec_id, CAST(min(va) AS BIGINT) AS dup_of
      |FROM pairs
      |WHERE d / (sqrt(na2) * sqrt(nb2)) >= 0.9
      |GROUP BY vb
      |ORDER BY vec_id""".stripMargin

  /** Cross-source duplication matrix — which sources carry the SAME
    * content (the report that drives a mixing policy: two crawls sharing
    * half their documents should not both be upweighted). Identity is the
    * normalized token-SET fingerprint (md5 of the sorted distinct tokens —
    * the same tokenization the dedup family oracles on), so re-ordered /
    * re-whitespaced copies still count; output is one row per unordered
    * source pair with the number of shared fingerprints.
    *
    * Scale shape: one distinct on (fingerprint, source), one groupBy on
    * the fingerprint whose per-group state is bounded by #sources (a
    * BOUNDED dimension — collect_set here is never data-scaled), then two
    * explodes of that ≤#sources array. Output ≤ #sources² rows. Never a
    * doc×doc pair list. */
  def qSourceOverlap(s: SparkSession, d: String): DataFrame = {
    val fp = md5(concat_ws("|",
      array_sort(array_distinct(TextOps.tokens(col("text"))))).cast("binary"))
    val dist = Tables.documents(s, d)
      .select(fp.as("h"), col("source")).distinct()
    dist.groupBy(col("h"))
      .agg(collect_set(col("source")).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(col("ss")).as("source_a"), col("ss"))
      .select(col("source_a"), explode(col("ss")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def qSourceOverlapSql: String =
    """WITH f AS (
      |  SELECT DISTINCT
      |   md5(list_aggregate(list_sort(list_distinct(
      |     regexp_split_to_array(trim(text), ' +'))), 'string_agg', '|')) AS h,
      |   source
      |  FROM documents)
      |SELECT a.source AS source_a, b.source AS source_b,
      | CAST(count(*) AS BIGINT) AS n_shared
      |FROM f a JOIN f b ON a.h = b.h AND a.source < b.source
      |GROUP BY 1, 2""".stripMargin

  /** EDIT-DISTANCE-1 NEAR-NEIGHBOR profile — typo-level fuzzy matching,
    * the record-linkage / entity-resolution primitive exact and token-set
    * dedup both miss (one substituted character is a DIFFERENT md5 and
    * usually a different token). Candidate generation is the SymSpell
    * DELETION NEIGHBORHOOD: every string joins on (itself ∪ its
    * one-char-deletion variants); ed(a,b) ≤ 1 GUARANTEES a shared
    * variant (deletion → b ∈ del(a); insertion → a ∈ del(b);
    * substitution → deleting the substituted position from both gives
    * the same string), so the equi-join is a COMPLETE candidate set and
    * a final `levenshtein ≤ 1` filter removes the ed=2 hangers-on
    * (shared-deletion pairs like abc/bca). Scale shape: variant rows are
    * Σ(len+1) — LINEAR in the corpus, one shuffle on the variant key —
    * versus the quadratic block-join a naive first-char/length blocking
    * runs; the verify is candidate-sized. Output is the per-entity
    * NEIGHBOR COUNT (the house rule: per-item decisions, never pair
    * lists — pair output is quadratic on clustered data). One cost term
    * is irreducibly OUTPUT-SCALED: the shared-variant join's row count
    * grows with the corpus's true ed-1 PAIR DENSITY (the thing the
    * report counts), so a 10x vocabulary with 10x-denser typo pairs
    * probes above the scan-bound ~1.5x — that is the report's own size,
    * not a plan defect (PROBE_local_r12's 2.75 line). */
  def qDedupEditdist(s: SparkSession, d: String): DataFrame = {
    val vocab = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_name").as("t")).distinct()
    // distinct (t, var): deleting any char of a repeated run yields the
    // SAME variant (zero-padded ids have 6-char zero runs → 6 duplicate
    // rows per name), and duplicate variant rows inflate the self-join
    // QUADRATICALLY per shared variant — dedup before joining
    val dels = vocab
      .withColumn("i", explode(sequence(lit(1), length(col("t")))))
      .select(col("t"),
        expr("concat(substring(t, 1, i-1), substring(t, i+1, length(t)))")
          .as("var"))
      .unionByName(vocab.select(col("t"), col("t").as("var")))
      .distinct()
    val cand = dels.as("a").join(dels.as("b"),
        col("a.var") === col("b.var") && col("a.t") < col("b.t"))
      .select(col("a.t").as("ta"), col("b.t").as("tb")).distinct()
    cand.filter(levenshtein(col("ta"), col("tb")) <= 1)
      .select(explode(array(col("ta"), col("tb"))).as("name"))
      .groupBy(col("name")).agg(count(lit(1)).as("n_near"))
      .orderBy(col("name"))
  }

  def qDedupEditdistSql: String =
    """WITH vocab AS (SELECT DISTINCT c_name AS t FROM customer),
      |pos AS (SELECT t, unnest(range(1, length(t)+1)) AS i FROM vocab),
      |dels AS (
      |  SELECT t, substr(t,1,CAST(i-1 AS INT))||substr(t,CAST(i+1 AS INT))
      |    AS var FROM pos
      |  UNION ALL SELECT t, t FROM vocab),
      |cand AS (SELECT DISTINCT a.t AS ta, b.t AS tb
      |         FROM dels a JOIN dels b ON a.var = b.var AND a.t < b.t),
      |pairs AS (SELECT ta, tb FROM cand WHERE levenshtein(ta, tb) <= 1)
      |SELECT name, CAST(count(*) AS BIGINT) AS n_near
      |FROM (SELECT ta AS name FROM pairs
      |      UNION ALL SELECT tb AS name FROM pairs)
      |GROUP BY name ORDER BY name""".stripMargin
}
