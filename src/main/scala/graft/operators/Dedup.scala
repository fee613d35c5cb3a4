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
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), Similarity.asDouble(col("embedding")).as("vec"))
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("vec").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("vec").as("vb"))
    a.join(b, "label")
      .filter(col("vec_a") < col("vec_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= 0.4)
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

  /** MinHash signature entries as columns sig_0..sig_{K-1}: for hash i,
    * min over tokens of xxhash64("i:" ++ token). Pure column exprs —
    * whole-stage codegen, no UDF. */
  private def withSignature(docs: DataFrame): DataFrame =
    (0 until MinhashK).foldLeft(
      docs.withColumn("toks", array_distinct(TextOps.tokens(col("text"))))) {
      (df, i) =>
        df.withColumn(s"sig_$i",
          array_min(transform(col("toks"), t => xxhash64(concat(lit(s"$i:"), t)))))
    }

  /** MinHash + LSH banding near-dup detection: signature → band keys →
    * bucket groupBy → within-bucket candidate pairs → exact-Jaccard verify.
    * Never materializes the O(n²) pair space. Rows-only check; the spec
    * verifies candidates against brute-force Jaccard. */
  def qDedupMinhash(s: SparkSession, d: String): DataFrame = {
    val sig = withSignature(Tables.documents(s, d))
      .select(Seq(col("doc_id"), col("toks")) ++
        (0 until NumBands).map { b =>
          hash((b * BandRows until (b + 1) * BandRows).map(i => col(s"sig_$i")): _*)
            .as(s"band_$b")
        }: _*)
    sig.persist()
    // One row per (band, bucket, doc): unpivot the band keys, then pair up
    // docs within a bucket. Candidate ids are deduped BEFORE tokens are
    // re-attached — token arrays never ride through the wide shuffle.
    val exploded = sig.select(col("doc_id"),
      explode(array((0 until NumBands).map(b =>
        struct(lit(b).as("band"), col(s"band_$b").as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val l = exploded.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val r = exploded.select(col("band"), col("bkey"), col("doc_id").as("doc_b"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    // exact verify: re-join token sets for the (deduped) candidate set only
    val toksA = sig.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val toksB = sig.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    candidates.join(toksA, "doc_a").join(toksB, "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc: bit k of the fingerprint is the sign of the
    * sum over tokens of ±1 according to bit k of xxhash64(token). Computed
    * as one explode + one groupBy (two narrow stages + one shuffle). */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$k")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { k =>
      when(col(s"b_$k") > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64-bit fingerprint into 4×16-bit
    * chunks; a pair with hamming distance ≤ ~3 must agree exactly on at
    * least one chunk (pigeonhole) → join per chunk, then verify hamming via
    * bit_count(xor). Rows-only check; spec verifies vs brute force. */
  def qDedupSimhash(s: SparkSession, d: String): DataFrame = {
    val fp = simhash(Tables.documents(s, d))
    val chunked = fp.select(Seq(col("doc_id"), col("simhash")) ++
      (0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as(s"chunk_$c")): _*)
    val pairs = (0 until 4).map { c =>
      val l = chunked.select(col("doc_id").as("doc_a"), col("simhash").as("fp_a"),
        col(s"chunk_$c").as("ck"))
      val r = chunked.select(col("doc_id").as("doc_b"), col("simhash").as("fp_b"),
        col(s"chunk_$c").as("ck"))
      l.join(r, "ck").filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("fp_a"), col("fp_b"))
    }.reduce(_ union _).distinct()
    pairs
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= 6)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
