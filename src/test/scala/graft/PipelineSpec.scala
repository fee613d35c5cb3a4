package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends GraftSpec {

  test("curation pipeline output is consistent with its stages") {
    val stats = Pipeline.curate(spark, sf).collect()
    assert(stats.nonEmpty)
    val curated = stats.map(_.getAs[Long]("n_docs")).sum
    val total = Tables.documents(spark, sf).count()
    // dedup + quality filtering must drop documents on this dup-heavy corpus
    assert(curated > 0 && curated < total, s"curated $curated of $total")
    stats.foreach { r =>
      val ratio = r.getAs[Double]("corpus_distinct_ratio")
      assert(ratio > 0 && ratio <= 1)
    }
    // survivors must contain no doc marked as a near-dup
    val nearDups = graft.operators.Dedup.qDedupMinhash(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = Tables.documents(spark, sf)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(graft.operators.Dedup.qDedupMinhash(spark, sf).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert((survivors & nearDups).isEmpty)
    // the decontamination stage is active at this sf: some docs exceed the
    // cut, and the curated count reflects their removal
    val contaminated = graft.operators.TextOps.qContamination(spark, sf)
      .filter(col("contamination") >= Pipeline.ContaminationCut)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(contaminated.nonEmpty, "expected contaminated docs at this sf")
  }

  test("curate-and-pack: every sequence except the last is exactly full, tokens conserved") {
    val seqs = Pipeline.curateAndPack(spark, sf).collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_tokens")))
      .sortBy(_._1)
    assert(seqs.nonEmpty)
    val C = graft.operators.TextOps.PackSeqLen.toLong
    // zero padding waste: all but the ragged last sequence hold exactly C
    seqs.dropRight(1).foreach { case (id, _, nTok) =>
      assert(nTok == C, s"sequence $id holds $nTok of $C tokens")
    }
    assert(seqs.last._3 <= C && seqs.last._3 > 0)
    // token conservation: packed tokens == the curated corpus's tokens
    val survivorTokens = Pipeline.survivors(spark, sf)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(seqs.map(_._3).sum == survivorTokens)
    // sequence ids are the dense prefix 0..n-1 (concat-and-chunk layout)
    assert(seqs.map(_._1).toSeq == (0L until seqs.length).toSeq)
  }

  test("entry returns non-empty flagship results") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("curate-clean-pack: packs exactly the span-cleaned survivor " +
      "tokens, full sequences, cleaning only ever removes") {
    val seqs = Pipeline.curateCleanPack(spark, sf).collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_tokens")))
      .sortBy(_._1)
    assert(seqs.nonEmpty)
    val C = graft.operators.TextOps.PackSeqLen.toLong
    seqs.dropRight(1).foreach { case (id, nTok) =>
      assert(nTok == C, s"sequence $id holds $nTok of $C tokens")
    }
    assert(seqs.last._2 <= C && seqs.last._2 > 0)
    // conservation: packed tokens == the survivors' CLEANED token mass
    val cleaned = graft.operators.TextOps.substrClean(
        Pipeline.survivors(spark, sf).select(col("doc_id"), col("text")))
      .collect()
    val cleanedTokens = cleaned.map(_.getAs[Long]("n_kept")).sum
    assert(seqs.map(_._2).sum == cleanedTokens)
    // cleaning only removes, never adds — and the survivor set at this
    // SF genuinely loses spans (doc-level dedup leaves partial overlaps)
    val survivorTokens = Pipeline.survivors(spark, sf)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(cleanedTokens <= survivorTokens)
    assert(cleaned.forall(r =>
      r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed")
        == r.getAs[Int]("n_tokens").toLong))
  }

  test("curate-mix-split-pack: packs exactly the mixed train survivors") {
    import graft.operators.Sampling
    val seqs = Pipeline.curateMixSplitPack(spark, sf).collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_tokens")))
      .sortBy(_._1)
    assert(seqs.nonEmpty)
    val C = graft.operators.TextOps.PackSeqLen.toLong
    seqs.dropRight(1).foreach { case (id, nTok) =>
      assert(nTok == C, s"sequence $id holds $nTok of $C tokens")
    }
    // token conservation against the SAME decisions applied to survivors
    val trainTokens = Pipeline.survivors(spark, sf)
      .filter(Sampling.mixKeepCol)
      .filter(Sampling.splitCol === "train")
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(seqs.map(_._2).sum == trainTokens)
    // the gate is real: strictly fewer tokens than packing all survivors
    val allTokens = Pipeline.survivors(spark, sf)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(trainTokens < allTokens)
  }

  test("export-shards: lossless, deterministic, one file per shard, manifest exact") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val nShards = 4
    val manifest = Pipeline.exportShards(spark, sf, out, nShards).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val data = spark.read.parquet(s"$out/data")
    // lossless: the shipped docs are exactly the mixed train survivors
    val shipped = data.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = Pipeline.trainSurvivors(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shipped == expected)
    // shard assignment is the declared pure function of doc_id
    assert(data.filter(
      col("shard") =!= pmod(xxhash64(col("doc_id")), lit(nShards))).count() == 0)
    // one data file per shard: a dataloader rank streams exactly one file
    (0 until nShards).foreach { k =>
      val files = new java.io.File(s"$out/data/shard=$k").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $k has ${files.length} files")
    }
    // manifest matches a recount of the shipped data
    val recount = data.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t")).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n"), r.getAs[Long]("t"))).toMap
    assert(manifest == recount)
    assert(manifest.keySet == (0L until nShards).toSet, "no empty shard here")
  }

  test("exportJsonl ships gzip JSONL shards losslessly with a recount manifest") {
    val nShards = 4
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val manifest = Pipeline.exportJsonl(spark, sf, out, nShards).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    // a plain json reader (any dataloader) gets the docs back exactly
    val data = spark.read.json(s"$out/data")
    val shipped = data.select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedDf = Pipeline.trainSurvivors(spark, sf)
    val expected = expectedDf.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shipped == expected)
    // text round-trips byte-exactly through the JSON encoding
    assert(data.select(col("doc_id"), col("text"))
      .join(expectedDf.select(col("doc_id"), col("text").as("t2")), "doc_id")
      .filter(col("text") =!= col("t2")).count() == 0)
    // one gzip file per shard
    (0 until nShards).foreach { k =>
      val files = new java.io.File(s"$out/data/shard=$k").listFiles()
        .filter(_.getName.endsWith(".json.gz"))
      assert(files.length == 1, s"shard $k has ${files.length} gzip files")
    }
    // manifest matches the readback recount
    val recount = data.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t")).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n"), r.getAs[Long]("t"))).toMap
    assert(manifest == recount)
  }

  test("tokenizePack: token conservation in tokenizer units, sequences " +
      "within budget") {
    import graft.operators.{Bpe, TextOps}
    import org.apache.spark.sql.functions._
    val docs = Pipeline.trainSurvivors(spark, sf).select("doc_id", "text")
    val rules = Bpe.train(docs, "text", 8)
    val total = Bpe.encode(docs, "doc_id", "text", rules)
      .filter(col("n_tokens") > 0)
      .agg(sum("n_tokens")).head().getLong(0)
    val packed = Pipeline.tokenizePack(spark, sf, nMerges = 8)
      .localCheckpoint()
    assert(packed.agg(sum("n_tokens")).head().getLong(0) == total,
      "packing lost or invented tokens")
    assert(packed.filter(col("n_tokens") > TextOps.PackSeqLen).count() == 0,
      "a sequence exceeds the budget")
    assert(packed.count() >= total / TextOps.PackSeqLen,
      "fewer sequences than the token volume can fit")
  }
}