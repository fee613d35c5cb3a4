package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** Flagship composition: the end-to-end training-data curation pass a
  * 100 TB corpus goes through, assembled entirely from the library's
  * operators — each stage is the scale-shaped variant (hash dedup, LSH
  * decisions, columnar quality features), so the whole pipeline is two
  * narrow scans + three shuffles regardless of corpus size (plus the
  * conditional scan-width exchange of Tables.documentsWide, which is an
  * identity on any corpus wide enough to feed the cores).
  *
  * documents → exact-dup removal (md5 groupBy) → near-dup removal
  * (MinHash-LSH decisions) → benchmark-decontamination → quality filter →
  * per-language corpus stats.
  */
object Pipeline {

  /** Contamination ratio above which a document is dropped (stage 3). */
  val ContaminationCut = 0.5

  /** The curated corpus (stages 1-4): exact dedup, near-dup decisions,
    * decontamination, quality filter — with per-doc token stats. */
  def survivors(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsWide(spark, dir) // r17: scan-width guard

    // stage 1: exact dedup — keep the smallest doc_id per md5(text)
    val keepExact = docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

    // stage 2: near-dup decisions — drop any doc the LSH pass marked
    val nearDups = Dedup.qDedupMinhash(spark, dir).select(col("doc_id"))

    // stage 3: benchmark decontamination — drop docs sharing too many
    // verbatim trigram spans with the held-out benchmark set
    val contaminated = TextOps.qContamination(spark, dir)
      .filter(col("contamination") >= ContaminationCut)
      .select(col("doc_id"))

    val keep = keepExact
      .join(nearDups, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")

    // stage 4: quality filter over survivors
    docs.join(keep, "doc_id")
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .filter(col("n_tokens") >= 12 &&
        col("n_distinct").cast("double") / col("n_tokens") >= 0.15)
  }

  /** Returns the per-language stats of the curated (deduped +
    * decontaminated + filtered) corpus. */
  def curate(spark: SparkSession, dir: String): DataFrame =
    survivors(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("total_tokens"),
        (sum(col("n_distinct")).cast("double") / sum(col("n_tokens")))
          .as("corpus_distinct_ratio"))

  /** Stage 5 — the final batch-prep hop: pack the CURATED corpus into
    * fixed-length training sequences (the `TextOps.packSpans` two-phase
    * prefix sum over the surviving docs, sparse doc_ids and all) and
    * summarize one row per sequence: how many doc spans landed in it and
    * how many tokens it holds. Every sequence except the ragged last is
    * exactly PackSeqLen full (spec invariant) — curation → packing as ONE
    * composed plan, no intermediate materialization. */
  def curateAndPack(spark: SparkSession, dir: String): DataFrame =
    TextOps.packSpans(
        survivors(spark, dir)
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tok")))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("doc_to") - col("doc_from")).as("n_tokens"))

  /** Stage 4.5 — SPAN-LEVEL cleaning before packing (the Lee et al.
    * order: ExactSubstr removal runs AFTER doc-level dedup, over the
    * surviving set — a span duplicated only against dropped docs is not
    * this corpus's duplication): clean the survivors with
    * [[TextOps.substrClean]] (corpus-first copy kept, later copies
    * excised; a doc fully consumed by removal drops out), then pack by
    * the CLEANED token counts — what packs is exactly the text that
    * would ship, not the pre-cleaning proxy. Same two-phase prefix-sum
    * pack; the cleaning's rewrite arm is blast-radius-bounded. */
  def curateCleanPack(spark: SparkSession, dir: String): DataFrame =
    TextOps.packSpans(
        TextOps.substrClean(
            survivors(spark, dir).select(col("doc_id"), col("text")))
          .filter(col("n_kept") > 0)
          .select(col("doc_id"), col("n_kept").as("n_tok")))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("doc_to") - col("doc_from")).as("n_tokens"))

  /** The FULL batch-prep chain: curate → mixture-sample (per-source
    * policy) → deterministic split → pack the TRAIN split into training
    * sequences. The mix and split decisions are the same salted-hash
    * columns the census queries report on ([[operators.Sampling]]), so
    * what ships to training is exactly what the reports describe — and
    * both fold into the survivors scan as narrow predicates (no new
    * shuffle before the pack's two-phase prefix sum). */
  def curateMixSplitPack(spark: SparkSession, dir: String): DataFrame =
    TextOps.packSpans(
        survivors(spark, dir)
          .filter(operators.Sampling.mixKeepCol)
          .filter(operators.Sampling.splitCol === "train")
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tok")))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("doc_to") - col("doc_from")).as("n_tokens"))

  /** TOKENIZER-TRUE packing — the chain a real trainer consumes: train
    * BPE ON the shipped corpus (operators.Bpe — the tokenizer belongs to
    * the data), encode it, and pack by the ACTUAL token counts instead
    * of the regex proxy (a proxy over/under-counts against the learned
    * vocabulary; packing by the wrong count overflows sequence slots or
    * wastes them). Same two-phase prefix-sum pack, same mix/split
    * filters as the census queries — what packs is exactly what the
    * reports describe, measured in the tokenizer's own units. */
  def tokenizePack(spark: SparkSession, dir: String,
      nMerges: Int = 16): DataFrame = {
    // BOTH consumers below (the trainer's word-count pass and the encode
    // pass) re-execute their input plan; without a barrier each one
    // replays the entire curation pipeline (exact dedup + LSH decisions +
    // contamination joins + quality filter + mix/split) — materialize the
    // curated slice ONCE (guide §1/§8: pay one scan, reuse a small
    // intermediate; the surviving (doc_id, text) rows are the pipeline's
    // natural narrow waist)
    val docs = trainSurvivors(spark, dir).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val rules = operators.Bpe.train(docs, "text", nMerges)
    TextOps.packSpans(
        operators.Bpe.encode(docs, "doc_id", "text", rules)
          .select(col("doc_id"), col("n_tokens").as("n_tok")))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("doc_to") - col("doc_from")).as("n_tokens"))
  }

  /** The mixed TRAIN-split survivor documents — the rows `exportShards`
    * ships and `curateMixSplitPack` packs (one definition, two sinks). */
  def trainSurvivors(spark: SparkSession, dir: String): DataFrame =
    survivors(spark, dir)
      .filter(operators.Sampling.mixKeepCol)
      .filter(operators.Sampling.splitCol === "train")
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("n_tokens").cast("long").as("n_tokens"))

  /** SHIP the curated train set: hash-shard [[trainSurvivors]] into
    * `nShards` dataloader shards under `outDir/data/shard=K`, one output
    * file per shard (each dataloader rank streams exactly one file), and
    * persist + return the per-shard manifest (docs, tokens). Shard
    * assignment is `pmod(xxhash64(doc_id), nShards)` — a pure function of
    * document identity, stable across runs, parallelism, and data layout,
    * like every other decision in the prep chain.
    *
    * Scale shape: ONE shuffle (the shard repartition — at 100 TB set
    * nShards to the dataloader's world size in the thousands and each
    * reducer streams one shard to its file); the manifest is a bounded
    * nShards-row aggregate. Nothing touches the driver but the manifest. */
  def exportShards(spark: SparkSession, dir: String, outDir: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    trainSurvivors(spark, dir)
      .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(nShards)))
      .repartition(nShards, col("shard"))
      .write.partitionBy("shard").mode("overwrite")
      .parquet(s"$outDir/data")
    val manifest = spark.read.parquet(s"$outDir/data")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }

  /** [[exportShards]] in JSONL — the training-interchange format every
    * dataloader speaks (one JSON document per line; Spark's json sink IS
    * newline-delimited). Same stable hash-sharding, same one-shuffle
    * scale shape, same recount manifest; gzip per shard file (the
    * standard wire form — json readers decompress transparently).
    * The manifest is still parquet: it is pipeline metadata, not
    * training data. */
  def exportJsonl(spark: SparkSession, dir: String, outDir: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    trainSurvivors(spark, dir)
      .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(nShards)))
      .repartition(nShards, col("shard"))
      .write.partitionBy("shard").mode("overwrite")
      .option("compression", "gzip")
      .json(s"$outDir/data")
    val manifest = spark.read.json(s"$outDir/data")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }
}
