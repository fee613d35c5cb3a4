package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Distributed BPE training (operators/Bpe.scala): rule sequence equals
  * a driver-side reference implementation (ties included), encoding
  * reproduces training states, round-trips, and compresses.
  */
class BpeSpec extends GraftSpec {

  /** Straight-line reference BPE over a word-frequency map, same
    * tie-break (count desc, then pair lexicographic). */
  private def refTrain(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var table: Map[Vector[String], Long] = words
      .groupBy { case (w, _) => w }.map { case (_, kv) => kv.head }
      .map { case (w, c) => (w.map(_.toString).toVector :+ Bpe.Eow, c) }
    val rules = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && rules.length < n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      table.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        rules += best
        table = table.map { case (syms, c) =>
          (Bpe.applyMerge(syms.toArray, best._1, best._2).toVector, c)
        }
      }
    }
    rules.toSeq
  }

  test("trained rule sequence equals the reference, ties included") {
    val docs = Tables.documents(spark, sf).limit(60)
    val words = docs.select(explode(split(trim(col("text")), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refTrain(words, 12)
    val got = Bpe.train(docs, "text", 12)
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got.length == 12)
    // r17: the driver-fit fast path and the distributed loop must learn
    // the SAME rule sequence — force the distributed path by setting the
    // fit threshold below the vocabulary size
    val gotDist = Bpe.train(docs, "text", 12, driverFitWords = 0L)
    assert(gotDist == want, s"\ndistributed path diverged:\ngot  $gotDist\nwant $want")
  }

  test("encoding reproduces training segmentation, round-trips, and " +
      "compresses") {
    val docs = Tables.documents(spark, sf).limit(40)
    val rules = Bpe.train(docs, "text", 16)
    val enc = Bpe.encode(docs, "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[String](2))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val (n, toks) = enc(id)
      assert(n == toks.length)
      // lossless: tokens concatenated and re-split on the end-of-word
      // sentinel give back exactly the pre-tokenized words
      val words = toks.mkString.split(java.util.regex.Pattern.quote(Bpe.Eow))
        .filter(_.nonEmpty).toSeq
      assert(words == text.trim.split(" +").filter(_.nonEmpty).toSeq,
        s"doc $id did not round-trip")
    }
    // merges only ever shrink token counts; 16 rules must beat 0 rules
    val enc0 = Bpe.encode(docs, "doc_id", "text", Nil)
      .agg(sum("n_tokens")).head().getLong(0)
    val enc16 = enc.values.map(_._1).sum
    assert(enc16 < enc0, s"no compression: $enc16 vs $enc0")
    // a training word's encoding equals its final training state:
    // re-derive by applying rules in rank order to a known word
    val w = texts.values.head.trim.split(" +").head
    val viaTrain = rules.foldLeft(w.map(_.toString).toArray :+ Bpe.Eow) {
      case (syms, (a, b)) => Bpe.applyMerge(syms, a, b)
    }.toSeq
    val viaEncode = enc(texts.find(_._2.trim.split(" +").head == w).get._1)
      ._2.take(viaTrain.length)
    assert(viaEncode == viaTrain)
  }

  test("tokenizer fertility report: counts equal a driver re-encode per " +
      "source; the tokenizer-served source reads lower fertility") {
    val sess = spark; import sess.implicits._
    import java.nio.file.Files
    // source 'hot': a tiny repeated vocabulary the 24 merges will fully
    // absorb; source 'cold': long unique words the table can't cover
    val hotWords = Seq("aa", "ab", "ba")
    val hot = (0 until 30).map(i =>
      (i.toLong, Seq.fill(6)(hotWords(i % 3)).mkString(" "), "hot"))
    val cold = (0 until 10).map(i =>
      (100L + i, (0 until 4).map(j => s"zq${i}x${j}wtf").mkString(" "), "cold"))
    val tmp = Files.createTempDirectory("graft_fert").toString
    (hot ++ cold).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val got = Bpe.qTokFertility(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"),
        r.getAs[Long]("n_whole"), r.getAs[Double]("fertility"),
        r.getAs[Double]("whole_frac")))).toMap
    // driver re-encode with the same trainer
    val docsDf = (hot ++ cold).toDF("doc_id", "text", "source")
    val rules = Bpe.train(docsDf, "text", 24)
    def enc(w: String): Int = rules.foldLeft(
      w.map(_.toString).toArray :+ Bpe.Eow) {
        case (s2, (a, b)) => Bpe.applyMerge(s2, a, b) }.length
    Seq("hot" -> hot, "cold" -> cold).foreach { case (src, docs) =>
      val words = docs.flatMap(_._2.trim.split(" +"))
      val pieces = words.map(enc(_).toLong).sum
      val whole = words.count(enc(_) == 1).toLong
      val want = (docs.size.toLong, words.size.toLong, pieces, whole,
        pieces.toDouble / words.size, whole.toDouble / words.size)
      assert(got(src) == want, s"$src: ${got(src)} vs $want")
    }
    assert(got("hot")._5 < got("cold")._5,
      "the tokenizer-served source must read lower fertility")
    assert(got("hot")._6 == 1.0, "3-char repeated vocab fully merges")
  }
}
