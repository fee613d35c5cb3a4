package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends GraftSpec {

  test("token stats cover every document") {
    val stats = TextOps.qDocTokens(spark, sf).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == Tables.documents(spark, sf).count())
    stats.foreach { r =>
      assert(r.getAs[Int]("min_tokens") >= 1)
      assert(r.getAs[Int]("max_tokens") >= r.getAs[Int]("min_tokens"))
    }
  }

  test("quality ratios are well-formed") {
    val rows = TextOps.qDocQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dr = r.getAs[Double]("distinct_ratio")
      assert(dr > 0 && dr <= 1.0)
      assert(r.getAs[Double]("stop_ratio") >= 0)
      assert(r.getAs[Int]("n_tokens") >= 12)
    }
  }

  test("langid accuracy is a valid ratio and predictions are exhaustive") {
    val rows = TextOps.qDocLangid(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0 && acc <= 1)
    }
  }

  test("fingerprints are stable and (here) collision-free") {
    val fp1 = TextOps.qDocFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fp2 = TextOps.qDocFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp1 == fp2)
    val nDistinctText = Tables.documents(spark, sf).select("text").distinct().count()
    assert(fp1.values.toSet.size == nDistinctText)
  }

  test("contamination counts equal a driver-side trigram-set intersection") {
    def trigrams(text: String): Set[String] = {
      val w = text.trim.split(" +")
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> trigrams(r.getString(1))).toMap
    val bench = docs.filter(_._1 < 10).values.flatten.toSet
    val expected = docs.collect {
      case (id, g) if id >= 10 && g.nonEmpty && (g & bench).nonEmpty =>
        id -> ((g & bench).size.toLong, g.size.toLong)
    }
    val got = TextOps.qContamination(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "corpus should contain contaminated docs")
  }

  test("repetition signals equal a driver-side computation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" +").toSeq)
      .filter(_._2.length >= 3).toMap
    val expected = docs.map { case (id, w) =>
      val topFrac = w.groupBy(identity).values.map(_.size).max.toDouble / w.length
      val tris = w.sliding(3).map(_.mkString(" ")).toSeq
      val dupFrac = 1.0 - tris.distinct.length.toDouble / tris.length
      id -> (w.length.toLong, topFrac, dupFrac, topFrac >= 0.15 || dupFrac >= 0.02)
    }
    val got = TextOps.qDocRepetition(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got == expected)
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "flag should split the corpus")
  }

  test("sequence packing: every sequence except the ragged last is exactly full") {
    val rows = TextOps.qDocPack(spark, sf).collect()
    // per-sequence occupancy = sum of doc spans landing in it
    val bySeq = rows.groupBy(_.getAs[Long]("seq_id")).map { case (s, rs) =>
      s -> rs.map(r => r.getAs[Long]("doc_to") - r.getAs[Long]("doc_from")).sum
    }
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, occ) =>
      if (s == lastSeq) assert(occ >= 1 && occ <= TextOps.PackSeqLen)
      else assert(occ == TextOps.PackSeqLen, s"sequence $s holds $occ tokens")
    }
    // spans tile each doc completely and in order
    val totalTokens = Tables.documents(spark, sf)
      .select(size(TextOps.tokens(col("text"))).cast("long")).collect()
      .map(_.getLong(0)).sum
    assert(rows.map(r => r.getAs[Long]("doc_to") - r.getAs[Long]("doc_from")).sum
      == totalTokens, "packed spans must cover every token exactly once")
    // seq_from + span never overflows the sequence
    rows.foreach { r =>
      val w = r.getAs[Long]("doc_to") - r.getAs[Long]("doc_from")
      assert(w > 0 && r.getAs[Long]("seq_from") + w <= TextOps.PackSeqLen)
    }
  }

  test("trained language model: 100% holdout accuracy on a planted " +
      "corpus with real per-language character distributions (the sf " +
      "corpus's labels are ~text-independent, so chance there is honest)") {
    val sp = spark; import sp.implicits._
    // disjoint alphabets per language: trigram profiles fully separate
    val alphabets = Map("de" -> "abcd", "en" -> "efgh", "es" -> "ijkl",
      "fr" -> "mnop", "zh" -> "qrst")
    def word(alpha: String, seed: Int): String =
      (0 until 5).map(i => alpha((seed * 7 + i * 3) % alpha.length)).mkString
    val docs = TextOps.LangSet.zipWithIndex.flatMap { case (l, li) =>
      (0 until 40).map { i =>
        ((li * 100 + i).toLong,
          (0 until 8).map(j => word(alphabets(l), i + j)).mkString(" "), l)
      }
    }
    val got = TextOps.langidModel(docs.toDF("doc_id", "text", "lang"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    TextOps.LangSet.foreach { l =>
      val (hn, hc) = got((l, "holdout"))
      val (tn, tc) = got((l, "train"))
      assert(hn > 0 && hc == hn, s"$l holdout $hc/$hn")
      assert(tn > 0 && tc == tn, s"$l train $tc/$tn")
    }
  }

  test("unigram entropy: exact quantized-grid values on a planted " +
      "fixture, repetitive < mixed < all-distinct, corpus bounds hold") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    def lq(x: Long): Long = math.floor(1e6 * math.log(x.toDouble)).toLong
    def ref(ts: Seq[String]): Double = {
      val n = ts.size.toLong
      val sc = ts.groupBy(identity).values
        .map(g => g.size.toLong * lq(g.size.toLong)).sum
      (n * lq(n) - sc).toDouble / (n * 1000000L).toDouble
    }
    val fixtures = Map(
      1L -> Seq.fill(12)("spam"),                       // entropy 0
      2L -> (Seq.fill(6)("a") ++ Seq.fill(6)("b")),     // ln 2
      3L -> (0 until 12).map(i => s"w$i"))              // ln 12
    val tmp = Files.createTempDirectory("graft_entropy").toString
    fixtures.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val got = TextOps.qDocEntropy(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy")))).toMap
    fixtures.foreach { case (id, ts) =>
      val (n, d, h) = got(id)
      assert(n == ts.size.toLong && d == ts.distinct.size.toLong)
      assert(h == ref(ts), s"doc $id: $h vs ${ref(ts)}")
    }
    assert(got(1L)._3 == 0.0 && got(1L)._3 < got(2L)._3
      && got(2L)._3 < got(3L)._3)
    assert(math.abs(got(2L)._3 - math.log(2)) < 1e-5)
    // corpus: entropy ∈ [0, ln n] everywhere, nonzero spread
    val corpus = TextOps.qDocEntropy(spark, sf).collect()
    corpus.foreach { r =>
      val (n, h) = (r.getAs[Long]("n_tokens"), r.getAs[Double]("entropy"))
      assert(h >= 0.0 && h <= math.log(n.toDouble) + 1e-6,
        s"entropy $h outside [0, ln $n]")
    }
    assert(corpus.map(_.getAs[Double]("entropy")).distinct.length > 10)
  }

  test("perplexity buckets: planted gibberish lands in the tail, " +
      "reference-identical docs in the head, doc counts conserve") {
    val sess = spark; import sess.implicits._
    val fluent = "the cat sat on the mat"
    // even doc_ids train the model; the gibberish docs are odd-only so
    // they never pollute the reference counts
    val docs =
      (0 until 40).map(i => (i.toLong, "fluent", fluent)) ++
        Seq((41L, "gib", "zz qq vv jj kk ww"),
          (43L, "gib", "xq qx zj jz vk kv"))
    val got = TextOps.perplexityBuckets(
      docs.toDF("doc_id", "source", "text")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("bucket")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(got(("fluent", "head")) == 40L, s"fluent: $got")
    assert(got(("gib", "tail")) == 2L, s"gib: $got")
    assert(got.values.sum == 42L)
    // corpus sanity: buckets partition the >=2-token docs, head is
    // nonempty (the reference half is its own head by construction)
    val corpus = TextOps.qDocPerplexity(spark, sf).collect()
    assert(corpus.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf)
        .filter(size(split(trim(col("text")), " +")) >= 2).count())
    assert(corpus.exists(_.getAs[String]("bucket") == "head"))
    corpus.foreach { r =>
      assert(r.getAs[Double]("nll_per_token") >= 0.0)
    }
  }

  test("rake keyphrases: exact hand-computed deg/freq scores on a " +
      "planted fixture; over-cap runs are excluded") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    // phrases: "deep learning"(2), "deep learning models"(3),
    // "fast inference"(2); deg/freq: deep 5/2, learning 5/2, models 3/1,
    // fast 2/1, inference 2/1 → scores 5e6 / 8e6 / 4e6
    val docs = Seq(
      (1L, "deep learning and deep learning models of fast inference"),
      // an over-cap stopword-free run must produce NO phrase
      (2L, (1 to (TextOps.RakeMaxLen + 1)).map(i => s"run$i").mkString(" ")))
    val tmp = Files.createTempDirectory("graft_rake").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val got = TextOps.qDocRake(spark, tmp).collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Int]("n_words"),
        r.getAs[Long]("n_occurrences"), r.getAs[Long]("score_scaled")))
      .toSeq
    assert(got == Seq(
      ("deep learning models", 3, 1L, 8000000L),
      ("deep learning", 2, 1L, 5000000L),
      ("fast inference", 2, 1L, 4000000L)), s"$got")
    assert(!got.exists(_._1.contains("run1")), "over-cap run leaked")
    // corpus: scores positive, phrases within cap, 20 rows
    val corpus = TextOps.qDocRake(spark, sf).collect()
    assert(corpus.length == 20)
    corpus.foreach { r =>
      assert(r.getAs[Int]("n_words") <= TextOps.RakeMaxLen)
      assert(r.getAs[Long]("score_scaled") > 0L)
    }
  }

  test("zipf report: exact quantized-OLS replay on the corpus; a planted " +
      "power law fits slope ~ -1; hapax/vocab stats match brute force") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    def lq(x: Long): Long = math.floor(1e6 * math.log(x.toDouble)).toLong
    def replay(freqs: Map[String, Long]): (Long, Long, Long, Long, Long) = {
      val top = freqs.toSeq.sortBy { case (t, c) => (-c, t) }
        .take(TextOps.ZipfK)
      val xy = top.zipWithIndex.map { case ((_, c), i) =>
        (lq(i + 1L), lq(c)) }
      val k = xy.size.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val sxy = xy.map { case (x, y) => x * y }.sum
      val sxx = xy.map { case (x, _) => x * x }.sum
      val num = BigInt(1000000) * (BigInt(k) * sxy - BigInt(sx) * sy)
      val den = BigInt(k) * sxx - BigInt(sx) * sx
      (freqs.values.sum, freqs.size.toLong,
        freqs.values.count(_ == 1L).toLong, k, (num / den).toLong)
    }
    val corpusFreqs = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), " +")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TextOps.qDocZipf(spark, sf).collect().head
    val want = replay(corpusFreqs)
    assert((got.getAs[Long]("n_tokens"), got.getAs[Long]("vocab_size"),
      got.getAs[Long]("hapax_count"), got.getAs[Long]("k"),
      got.getAs[Long]("slope_scaled")) == want, s"corpus: $got vs $want")

    // planted power law c_r = floor(2000 / r): slope within 10% of -1
    val planted = (1 to 80).flatMap(r =>
      Seq.fill(2000 / r)(s"w$r")).mkString(" ")
    val tmp = Files.createTempDirectory("graft_zipf").toString
    Seq((1L, planted)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val slope = TextOps.qDocZipf(spark, tmp).collect()
      .head.getAs[Long]("slope_scaled")
    assert(slope > -1100000L && slope < -900000L,
      s"planted power law must fit ~ -1, got $slope")
  }

  test("gopher rules: eight planted docs — seven single-rule failures " +
      "and one survivor — report exactly their own kill") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    val filler = (1 to 58).map(i => s"word$i")
    val docs = Seq(
      (0L, "pass", ("the" +: "and" +: filler).mkString(" ")),
      (1L, "wc", "the and word1 word2 word3"),
      (2L, "mwl", ("the" +: "and" +:
        (1 to 58).map(_ => "abcdefghijklmno")).mkString(" ")),
      (3L, "sym", ("the" +: "and" +: (1 to 58).map(i =>
        if (i <= 7) s"aa#b$i" else s"word$i")).mkString(" ")),
      (4L, "bullet", (1 to 10).map(_ =>
        "- the and fooa foob fooc food").mkString("\n")),
      (5L, "ell", (1 to 10).map(i =>
        if (i <= 4) "the and fooa foob fooc food..."
        else "the and fooa foob fooc food").mkString("\n")),
      (6L, "alpha", ("the" +: "and" +: ((1 to 38).map(i => s"abcw$i") ++
        (1 to 20).map(_ => "12345"))).mkString(" ")),
      (7L, "stop", (1 to 60).map(i => s"zeta$i").mkString(" ")))
    val tmp = Files.createTempDirectory("graft_gopher").toString
    docs.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val got = TextOps.qDocGopher(spark, tmp).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val ruleCol = Map("wc" -> "n_fail_wordcount", "mwl" -> "n_fail_meanwordlen",
      "sym" -> "n_fail_symbol", "bullet" -> "n_fail_bullet",
      "ell" -> "n_fail_ellipsis", "alpha" -> "n_fail_alpha",
      "stop" -> "n_fail_stopword")
    val allCols = ruleCol.values.toSeq
    ruleCol.foreach { case (src, c) =>
      val r = got(src)
      assert(r.getAs[Long](c) == 1L, s"$src should fail $c")
      allCols.filterNot(_ == c).foreach(o =>
        assert(r.getAs[Long](o) == 0L, s"$src unexpectedly fails $o"))
      assert(r.getAs[Long]("n_pass") == 0L)
    }
    val p = got("pass")
    allCols.foreach(c => assert(p.getAs[Long](c) == 0L, s"pass fails $c"))
    assert(p.getAs[Long]("n_pass") == 1L)
    // corpus: report covers every source and every doc exactly once
    val corpus = TextOps.qDocGopher(spark, sf).collect()
    assert(corpus.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
  }

  test("per-source KL divergence equals a driver-side exact grid replay; " +
      "a corpus-matching source scores near zero, a skewed one higher") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    def lq(x: Long): Long = math.floor(1e6 * math.log(x.toDouble)).toLong
    def ref(bySource: Map[String, Seq[String]])
        : Map[String, (Long, Long, Long)] = {
      val corpus = bySource.values.flatten.toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = BigInt(corpus.values.sum)
      bySource.map { case (src, toks) =>
        val cs = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val ns = BigInt(toks.size)
        val ts = cs.map { case (w, c) =>
          BigInt(c) * (lq(c) - lq(ns.toLong) - lq(corpus(w)) + lq(n.toLong))
        }.sum
        src -> ((toks.size.toLong, cs.size.toLong, (ts / ns).toLong))
      }
    }
    // "match" draws from the corpus-majority distribution; "skew" is
    // concentrated on one token the rest of the corpus barely uses
    val bySource = Map(
      "match" -> (Seq.fill(40)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")),
      "also"  -> (Seq.fill(80)("a") ++ Seq.fill(40)("b") ++ Seq.fill(20)("c")),
      "skew"  -> (Seq.fill(65)("z") ++ Seq.fill(5)("a")))
    val tmp = Files.createTempDirectory("graft_kldiv").toString
    bySource.toSeq.zipWithIndex
      .map { case ((src, ts), i) => (i.toLong, ts.mkString(" "), src) }
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val want = ref(bySource)
    val got = TextOps.qDocKldiv(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("kl_scaled")))).toMap
    assert(got == want, s"got $got\nwant $want")
    // the skewed source must dominate both corpus-shaped ones clearly
    assert(got("skew")._3 > got("match")._3 + 500000 &&
      got("skew")._3 > got("also")._3 + 500000, s"got $got")
    // corpus run: exact replay too (the real gate input)
    val corpusSrc = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.flatMap(_._2.trim.split(" +")).toSeq).toMap
    val wantC = ref(corpusSrc.toMap)
    val gotC = TextOps.qDocKldiv(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("kl_scaled")))).toMap
    assert(gotC == wantC)
    assert(gotC.nonEmpty)
  }

  test("compressibility: repetitive text compresses far below mixed " +
      "prose, gibberish barely compresses, sizes are re-run stable") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    val rnd = new scala.util.Random(11)
    val fixtures = Map(
      1L -> Seq.fill(200)("spam spam spam").mkString(" "),      // templated
      2L -> (0 until 600).map(i => s"w${i % 80}").mkString(" "), // mixed
      3L -> Array.fill(3000)(
        ('a' + rnd.nextInt(26)).toChar).mkString)               // gibberish
    val tmp = Files.createTempDirectory("graft_compress").toString
    fixtures.toSeq.map { case (id, t) => (id, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    def run(): Map[Long, (Long, Long, Double)] =
      TextOps.qDocCompress(spark, tmp).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bytes"), r.getAs[Long]("n_deflate"),
            r.getAs[Double]("ratio")))).toMap
    val got = run()
    // byte counts are exact UTF-8 lengths
    fixtures.foreach { case (id, t) =>
      assert(got(id)._1 == t.getBytes("UTF-8").length.toLong) }
    // two-sided gate semantics: templated << mixed << gibberish
    assert(got(1L)._3 < 0.1, s"templated should crush: ${got(1L)}")
    assert(got(1L)._3 < got(2L)._3 && got(2L)._3 < got(3L)._3, s"$got")
    assert(got(3L)._3 > 0.5, s"gibberish should resist: ${got(3L)}")
    // deterministic across runs (fixed level, one-shot input)
    assert(run() == got)
    // corpus runs end to end with one row per doc
    assert(TextOps.qDocCompress(spark, sf).count() ==
      Tables.documents(spark, sf).count())
  }

  test("Heaps' law: exact replay on the corpus; a planted sqrt-growth " +
      "vocabulary fits beta near 1/2") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    def lq(x: Long): Long = math.floor(1e6 * math.log(x.toDouble)).toLong
    val K = TextOps.HeapsK
    // driver reference: doc_id-ordered token stream → first positions →
    // checkpoint buckets → quantized-log OLS
    def ref(docs: Seq[(Long, Seq[String])]): (Long, Long, Long) = {
      val stream = docs.sortBy(_._1).flatMap(_._2)
      val n = stream.size.toLong
      val firsts = stream.zipWithIndex
        .groupBy(_._1).view.mapValues(_.map(_._2 + 1L).min).toMap
      val pts = (1 to K).map { j =>
        val p = j * n / K
        (p, firsts.values.count(_ <= p).toLong)
      }.filter(t => t._1 >= 1 && t._2 >= 1)
      val xs = pts.map(t => BigInt(lq(t._1)))
      val ys = pts.map(t => BigInt(lq(t._2)))
      val k = BigInt(pts.size)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      (n, firsts.size.toLong,
        (BigInt(1000000) * (k * sxy - sx * sy) / (k * sxx - sx * sx)).toLong)
    }
    // planted: token at global position t is w_ceil(sqrt(t)) → V(n) =
    // ceil(sqrt(n)), the Heaps curve with beta = 1/2 exactly
    val planted: Seq[(Long, Seq[String])] = (0 until 40).map { d =>
      d.toLong -> (1 to 25).map { i =>
        val t = d * 25 + i
        s"w${math.ceil(math.sqrt(t.toDouble)).toLong}"
      }
    }
    val tmp = Files.createTempDirectory("graft_heaps").toString
    planted.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val gotP = TextOps.qDocHeaps(spark, tmp).collect().head
    val wantP = ref(planted)
    assert((gotP.getAs[Long]("n_tokens"), gotP.getAs[Long]("vocab_size"),
      gotP.getAs[Long]("slope_scaled")) == wantP, s"planted: $gotP vs $wantP")
    assert(gotP.getAs[Double]("beta") > 0.40 &&
      gotP.getAs[Double]("beta") < 0.60,
      s"sqrt-growth corpus should fit beta ~ 0.5: ${gotP.getAs[Double]("beta")}")
    // corpus: replay equality (the saturating word-soup vocabulary reads
    // a near-zero slope — that IS the diagnostic)
    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" +").toSeq).toSeq
    val gotC = TextOps.qDocHeaps(spark, sf).collect().head
    val wantC = ref(corpus)
    assert((gotC.getAs[Long]("n_tokens"), gotC.getAs[Long]("vocab_size"),
      gotC.getAs[Long]("slope_scaled")) == wantC, s"corpus: $gotC vs $wantC")
  }

  test("q_doc_mtld: exact replay of the integer factor fold on the " +
      "corpus; planted repetitive vs diverse docs and the degenerate " +
      "classes land where the paper says") {
    // the reference fold — the same integer transitions the SQL
    // expression runs (0.72 threshold as 100·types < 72·tokens)
    def mtldScaled(toks: Seq[String]): (Long, Long, Option[Long]) = {
      var f = 0L; var cnt = 0L; var cur = Vector.empty[String]
      toks.foreach { t =>
        val nc = if (cur.contains(t)) cur else cur :+ t
        if (100L * nc.size < 72L * (cnt + 1)) { f += 1; cnt = 0; cur = Vector.empty }
        else { cnt += 1; cur = nc }
      }
      val n = toks.size.toLong
      val (cr, tyr) = (cnt, cur.size.toLong)
      val den = 28 * cr * f + 100 * (cr - tyr)
      val scaled =
        if (cr == 0 && f > 0) Some(1000000L * n / f)
        else if (den > 0) Some(1000000L * 28 * n * cr / den)
        else None
      (n, f, scaled)
    }
    // corpus replay: every doc's (n_tokens, factors, mtld_scaled)
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> mtldScaled(r.getString(1).trim
        .split(" +").toSeq)).toMap
    val got = TextOps.qDocMtld(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, f, sc) = want(r.getLong(0))
      assert(r.getAs[Long]("n_tokens") == n &&
        r.getAs[Long]("factors") == f &&
        Option(r.getAs[java.lang.Long]("mtld_scaled")).map(_.toLong) == sc,
        s"doc ${r.getLong(0)}: $r vs ($n, $f, $sc)")
    }
    // planted semantics, hand-derived: a the/cat/sat cycle closes a
    // factor every 5 tokens (types stick at 3; 100·3 < 72·5 first at
    // token 5 of the factor), so 120 tokens = 24 factors, empty
    // remainder → MTLD = 120/24 = 5 exactly
    locally {
      val rep = Seq.fill(40)(Seq("the", "cat", "sat")).flatten
      assert(mtldScaled(rep) == ((120L, 24L, Some(5000000L))))
      // all-distinct doc never closes a factor, TTR_rem = 1 → NULL
      assert(mtldScaled((0 until 120).map(i => s"w$i")) ==
        ((120L, 0L, None)))
      // non-empty remainder: 122 tokens = 24 factors + 2-token
      // remainder (cr=2, tyr=2) → den = 28·2·24 + 0 = 1344,
      // MTLD = 28·122·2/1344 = 6832/1344 → scaled 5083333
      assert(mtldScaled(rep ++ Seq("the", "cat")) ==
        ((122L, 24L, Some(5083333L))))
    }
  }
}
