package graft

import graft.operators.{Relational2, Sampling}
import org.apache.spark.sql.functions._

class SamplingSpec extends GraftSpec {

  /** Local reimplementation of the operator's hash draw: lowercase-hex md5
    * prefix of salt || doc_id, the exact bytes Spark and DuckDB hash. */
  private def hash4(salt: String, docId: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$salt$docId".getBytes("UTF-8"))
      .take(2).map(b => f"$b%02x").mkString
  }

  private def docs(): Array[(Long, String, Long)] =
    Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("hexCutoff renders floor(f * 16^4) as comparable lowercase hex") {
    assert(Sampling.hexCutoff(0.80) == "cccc")
    assert(Sampling.hexCutoff(0.90) == "e666")
    assert(Sampling.hexCutoff(1.0) == "g") // sorts above every hex prefix
    assert(Sampling.hexCutoff(0.0) == "0000") // nothing sorts below it
    assert(Sampling.hexCutoff(0.5) == "8000")
  }

  test("q_doc_split matches a local brute-force recompute exactly") {
    val expected = docs()
      .map { case (id, src, nc) =>
        val h = hash4("split1:", id)
        val split =
          if (h < "cccc") "train" else if (h < "e666") "val" else "test"
        ((src, split), (1L, nc))
      }
      .groupBy(_._1)
      .map { case (k, vs) =>
        k -> (vs.map(_._2._1).sum, vs.map(_._2._2).sum)
      }
    val got = Sampling.qDocSplit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // exhaustive: every document in exactly one split
    assert(got.values.map(_._1).sum == docs().length)
  }

  test("q_doc_mix matches a local brute-force recompute exactly") {
    val policy = Sampling.MixPolicy.toMap
    val expected = docs()
      .map { case (id, src, nc) =>
        val cut = Sampling.hexCutoff(policy.getOrElse(src, Sampling.MixDefault))
        val keep = hash4("mix1:", id) < cut
        (src, (1L, if (keep) 1L else 0L, if (keep) nc else 0L))
      }
      .groupBy(_._1)
      .map { case (k, vs) =>
        k -> (vs.map(_._2._1).sum, vs.map(_._2._2).sum, vs.map(_._2._3).sum)
      }
    val got = Sampling.qDocMix(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // achieved_rate is exactly kept/total on every row
    Sampling.qDocMix(spark, sf).collect().foreach { r =>
      assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
  }

  test("split and mix decisions are independent draws (different salts)") {
    val ids = docs().map(_._1)
    val splitHash = ids.map(hash4("split1:", _)).toSeq
    val mixHash = ids.map(hash4("mix1:", _)).toSeq
    assert(splitHash != mixHash)
  }

  test("stratified sampling realizes per-stratum rates and is deterministic") {
    val totals = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.25, "3-MEDIUM" -> 0.1,
      "4-NOT SPECIFIED" -> 0.1, "5-LOW" -> 0.05)
    val s1 = Relational2.qSampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Relational2.qSampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2, "seeded sampling must be deterministic")
    s1.foreach { case (k, n) =>
      val expect = totals(k) * rates(k)
      // Bernoulli sampling: allow 4 sigma
      val sigma = math.sqrt(totals(k) * rates(k) * (1 - rates(k)))
      assert(math.abs(n - expect) <= 4 * sigma + 1,
        s"$k: sampled $n, expected ~$expect (sigma $sigma)")
    }
  }

  test("curriculum: the census equals the exploded training stream, " +
      "high tier upsamples 3x, decisions are partitioning-stable") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val census = Sampling.qDocCurriculum(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val stream = Sampling.curriculumExamples(docs)
    val fromStream = stream.groupBy("source", "tier")
      .agg(countDistinct(col("doc_id")).as("kept"),
        count(lit(1)).as("examples"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    fromStream.foreach { case (k, (kept, ex)) =>
      val (_, cKept, cEx, _) = census(k)
      assert(cKept == kept && cEx == ex, s"census diverges at $k")
    }
    // high tier: examples = 3x kept; others 1x
    census.foreach { case ((_, tier), (_, kept, ex, _)) =>
      val expectedEpochs = if (tier == "high") 3L else 1L
      assert(ex == kept * expectedEpochs, s"$tier epochs wrong: $kept -> $ex")
    }
    // partitioning must not move a single decision
    val a = stream.select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Sampling.curriculumExamples(docs.repartition(13))
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b, "curriculum decisions moved under repartitioning")
    assert(a.nonEmpty)
  }

  test("DSIR importance scores: exact vs a local reference model with a " +
      "forced-small vocab (OOV bucket live), target-like docs selected") {
    val sp = spark; import sp.implicits._
    // target docs speak {alpha, beta}; raw-only docs {zeta, eta}; doc 6
    // is a raw doc written in the target's vocabulary (the doc DSIR
    // exists to find); doc 5 mixes. V = 3 keeps only the top-3 features
    // in vocab, so bigrams and rarer unigrams flow through the OOV bucket.
    val rows = Seq(
      (1L, "alpha beta alpha", true),
      (2L, "beta alpha beta alpha", true),
      (3L, "zeta eta zeta eta", false),
      (4L, "eta zeta eta", false),
      (5L, "alpha zeta", false),
      (6L, "alpha beta beta", false))
    val v = 3
    val got = Sampling.dsirScores(
      rows.toDF("doc_id", "text", "is_tgt"), col("is_tgt"), v)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap

    // independent local reference (same model, plain Scala)
    def feats(t: String): Seq[String] = {
      val toks = t.trim.split(" +").toSeq
      toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val byDoc = rows.map { case (id, t, tgt) => (id, feats(t), tgt) }
    val all = byDoc.flatMap { case (_, fs, tgt) => fs.map(f => (f, tgt)) }
    val rawC = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tgtC = all.filter(_._2).groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val vocab = rawC.toSeq.sortBy { case (f, c) => (-c, f) }.take(v).map(_._1)
    val (nRaw, nTgt) = (all.size.toLong, all.count(_._2).toLong)
    val vRaw = vocab.map(rawC).sum
    val vTgt = vocab.map(f => tgtC.getOrElse(f, 0L)).sum
    val vp = vocab.size + 1L
    def lq(a: Long, b: Long): Long =
      math.floor(1e6 * math.log(a.toDouble / b.toDouble)).toLong
    val l0 = lq(nRaw + vp, nTgt + vp)
    val lOov = lq(nTgt - vTgt + 1, nRaw - vRaw + 1)
    val lf = vocab.map(f =>
      f -> lq(tgtC.getOrElse(f, 0L) + 1, rawC(f) + 1)).toMap
    val expected = byDoc.map { case (id, fs, _) =>
      val score = fs.map(f => lf.getOrElse(f, lOov) + l0).sum
      id -> ((fs.size.toLong, score, score > 0))
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // the semantic point: the raw doc written in the target vocabulary is
    // kept, the off-domain raw docs are dropped
    assert(got(6L)._3, "target-like raw doc must be selected")
    assert(!got(3L)._3 && !got(4L)._3, "off-domain docs must not be selected")
    // OOV bucket is live under the forced vocab cut
    assert(rawC.size > v, "fixture must overflow the vocabulary")
  }

  test("unimax: hand-computed water-filling on a planted fixture, exact " +
      "budget/cap invariants on the corpus") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    // per-source token counts 5 / 10 / 250 / 250 → caps 10/20/500/500,
    // budget = 2·515 DIV 5 = 206; i=1: 10·4 ≤ 206 capped, i=2: 20·3 ≤ 196
    // capped, i=3: 500·2 > 176 uncapped → level 176 DIV 2 = 88, r = 0
    def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "sA", doc(5)), (2L, "sB", doc(10)),
      (3L, "sC", doc(125)), (4L, "sC", doc(125)),
      (5L, "sD", doc(250)))
    val tmp = Files.createTempDirectory("graft_unimax").toString
    docs.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val got = Sampling.qDocUnimax(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("cap_tokens"),
          r.getAs[Long]("alloc_tokens")))).toMap
    assert(got == Map(
      "sA" -> ((5L, 10L, 10L)), "sB" -> ((10L, 20L, 20L)),
      "sC" -> ((250L, 500L, 88L)), "sD" -> ((250L, 500L, 88L))), s"$got")

    // corpus invariants: alloc ≤ cap everywhere; total alloc spends the
    // budget exactly (caps sum to 2× corpus > 2/5 budget, so never
    // cap-bound here); uncapped allocations level within 1 token
    val rows = Sampling.qDocUnimax(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = total * Sampling.UnimaxBudgetNum / Sampling.UnimaxBudgetDen
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("cap_tokens"))
      assert(r.getAs[Double]("epochs_alloc") <=
        Sampling.UnimaxEpochCap.toDouble + 1e-9)
    }
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == budget)
    val uncapped = rows.filter(r =>
      r.getAs[Long]("alloc_tokens") < r.getAs[Long]("cap_tokens"))
      .map(_.getAs[Long]("alloc_tokens"))
    if (uncapped.nonEmpty)
      assert(uncapped.max - uncapped.min <= 1L,
        s"uncapped allocations must level: ${uncapped.toSeq.sorted}")
  }

  test("temperature sampling: hand-computed sqrt weights on a planted " +
      "fixture; budget spent exactly and tails upweighted on the corpus") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    // token counts 100/400/2500 → weights 1e7/2e7/5e7, Σw=8e7,
    // budget = 2·3000 DIV 5 = 1200 → allocs 150/300/750 (zero leftover),
    // epochs 1.5 / 0.75 / 0.3 — the α=1/2 tail upweighting, visibly
    def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, "sA", doc(100)), (2L, "sB", doc(400))) ++
      (3L to 7L).map(i => (i, "sC", doc(500)))
    val tmp = Files.createTempDirectory("graft_temp").toString
    docs.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val got = Sampling.qDocTemperature(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_scaled"),
          r.getAs[Long]("alloc_tokens"),
          r.getAs[Double]("epochs_alloc")))).toMap
    assert(got == Map(
      "sA" -> ((100L, 10000000L, 150L, 1.5)),
      "sB" -> ((400L, 20000000L, 300L, 0.75)),
      "sC" -> ((2500L, 50000000L, 750L, 0.3))), s"$got")

    // corpus: the budget is spent exactly; a source with >2x the tokens
    // of another gets strictly fewer epochs (sqrt upweighting)
    val rows = Sampling.qDocTemperature(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum ==
      total * Sampling.UnimaxBudgetNum / Sampling.UnimaxBudgetDen)
    for {
      a <- rows; b <- rows
      if a.getAs[Long]("n_tokens") * 2 < b.getAs[Long]("n_tokens")
    } assert(a.getAs[Double]("epochs_alloc") > b.getAs[Double]("epochs_alloc"),
      s"tail must be upweighted: $a vs $b")
  }
}
