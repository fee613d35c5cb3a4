package graft

import graft.operators.{TextIndex, TextOps}
import org.apache.spark.sql.functions._

/** Inverted text index: search equals the direct token-scan baseline,
  * posting files prune at the manifest level for selective terms, and
  * the text column never enters the query plan. */
class TextIndexSpec extends GraftSpec {

  test("index search == contains-scan baseline; manifest prunes posting " +
      "files; the query never reads text") {
    val terms = Seq("spark", "merge", "window")
    val got = TextIndex.search(spark, sf, terms).collect()
      .map(_.getLong(0)).toSet
    val baseline = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(terms.map(t => array_contains(col("toks"), t)).reduce(_ && _))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == baseline, s"index diverged: ${got.size} vs ${baseline.size}")
    assert(got.nonEmpty)
    // a RARE term's search must open fewer posting files than the index
    // holds (token-clustered files + stats/bloom pruning); find a rare
    // token from the corpus
    val rare = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count"), col("t"))
      .head().getString(0)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // finalize the adaptive plan + populate metrics
      df.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.metrics("numFiles").value
      }.sum
    }
    val all = TextIndex.postings(spark, sf)
    val total = all.inputFiles.length
    val pruned = scannedFiles(all.filter(col("token") === rare))
    assert(total >= 4, s"index not multi-file ($total)")
    assert(pruned < total,
      s"rare-term search read all $total posting files (no pruning)")
    // text never in the plan
    val plan = TextIndex.search(spark, sf, terms)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("text#") && !plan.contains("documents.parquet"),
      "search plan references the text column / the corpus scan")
  }

  test("phrase search: adjacency only (scattered words excluded), " +
      "repeated-token phrases, chain length 3") {
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_phr").toString
    Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha gamma beta alpha beta"), // 'alpha beta' at 3-4 only
      (3L, "beta alpha"), // reversed: NOT the phrase
      (4L, "alpha beta beta alpha beta"), // 'beta beta' at 1-2
      (5L, "gamma gamma alpha")) // scattered, no phrase
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    def phrase(ts: String*): Set[Long] =
      TextIndex.searchPhrase(spark, tmp, ts)
        .collect().map(_.getLong(0)).toSet
    assert(phrase("alpha", "beta") == Set(1L, 2L, 4L))
    assert(phrase("alpha", "beta", "gamma") == Set(1L))
    assert(phrase("beta", "beta") == Set(4L))
    assert(phrase("beta", "alpha") == Set(2L, 3L, 4L))
    assert(phrase("gamma", "alpha") == Set(5L))
    assert(phrase("alpha") == Set(1L, 2L, 3L, 4L, 5L)) // 1-term = boolean
    graft.streaming.MirrorLoop.rmrf(new java.io.File(tmp))
  }

  test("topK ranked == head-K of the full ranking; plan is a bounded " +
      "TakeOrderedAndProject (no global sort); searchAny == OR baseline") {
    val terms = TextIndex.SearchTerms
    val full = TextIndex.searchRanked(spark, sf, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    for (k <- Seq(1, 10, 25)) {
      val topk = TextIndex.searchRankedTopK(spark, sf, terms, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(topk.toSeq == full.take(k).toSeq,
        s"topK($k) diverged from head-$k of the full ranking")
    }
    val topDf = TextIndex.searchRankedTopK(spark, sf, terms, 10)
    topDf.collect() // finalize the adaptive plan
    val p = topDf.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"topK must be a bounded heap cut, got:\n$p")
    assert(!p.replace("TakeOrderedAndProject", "").contains("Sort "),
      s"topK plan has a global sort:\n$p")
    // WAND-class pruned cut == the unpruned cut at several k
    for (k <- Seq(1, 10, 25)) {
      val pruned = TextIndex.searchRankedTopK(spark, sf, terms, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaUb = TextIndex.searchRankedTopKPruned(spark, sf, terms, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(pruned == viaUb, s"pruned topK($k) diverged")
    }
    // OR semantics: ANY-match + matched-term counts == the token baseline
    val any = TextIndex.searchAny(spark, sf, terms).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), terms.map(t =>
        array_contains(col("toks"), t).cast("long")).reduce(_ + _).as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(any == base, s"searchAny diverged (${any.size} vs ${base.size})")
  }

  test("phrase-ranked topK == BM25 full ranking restricted to phrase " +
      "matches, head-K; scores equal the unrestricted searchRanked " +
      "scores (global df)") {
    val phrase = TextIndex.PhraseTerms
    val cands = TextIndex.searchPhrase(spark, sf, phrase)
      .collect().map(_.getLong(0)).toSet
    assert(cands.nonEmpty, "fixture corpus must contain the phrase")
    val full = TextIndex.searchRanked(spark, sf, phrase.distinct)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val restricted = full.filter(p => cands(p._1))
    for (k <- Seq(1, 5, 10)) {
      val got = TextIndex.searchPhraseRankedTopK(spark, sf, phrase, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == restricted.take(k).toSeq,
        s"phrase-ranked topK($k) diverged")
    }
  }

  test("upper-bound pruning strictly shrinks the scored set on a " +
      "skew-planted corpus, and the cut still equals the full ranking") {
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_wand").toString
    // 'common' in every doc (low idf — matching it alone cannot reach
    // the top-k); 'rare' in 4 docs (high idf). Common-only docs must be
    // PRUNED before scoring.
    val docs = (1L to 200L).map { i =>
      if (i <= 4) (i, s"rare common filler_$i")
      else (i, s"common filler_$i pad_$i")
    }
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val terms = Seq("rare", "common")
    val (survivors, result) =
      TextIndex.topKPrunedParts(spark, tmp, terms, k = 3)
    val nSurv = survivors.count()
    val nMatch = TextIndex.searchAny(spark, tmp, terms).count()
    assert(nMatch == 200L, s"planted corpus: $nMatch matchers")
    assert(nSurv < nMatch / 10,
      s"pruning kept $nSurv of $nMatch matchers — no effective cut")
    val full = TextIndex.searchRanked(spark, tmp, terms)
      .limit(3).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = result.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == full, "pruned cut diverged on the planted corpus")
    graft.streaming.MirrorLoop.rmrf(new java.io.File(tmp))
  }
}
