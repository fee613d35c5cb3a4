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
}
