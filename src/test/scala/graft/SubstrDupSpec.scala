package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Exact-substring dedup (TextOps.qDocSubstrdup — the ExactSubstr method
  * of Lee et al. 2022): planted nested / overlapping / cross-doc /
  * within-doc repeats against a straight-line brute-force reference, plus
  * the corpus invariants at sf0.001. */
class SubstrDupSpec extends GraftSpec {

  private val L = TextOps.SubstrLen

  /** Brute-force ExactSubstr coverage: mark every position lying in some
    * length-L token window whose joined gram occurs ≥2 times anywhere in
    * the corpus; union; report merged maximal covered runs. */
  private def reference(docs: Seq[(Long, String)])
      : Map[Long, (Int, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split(" +").filter(_.nonEmpty) }
    val occ = scala.collection.mutable.Map[String, Int]()
    toks.foreach { case (_, ts) =>
      (0 to ts.length - L).foreach { i =>
        val g = ts.slice(i, i + L).mkString(" ")
        occ(g) = occ.getOrElse(g, 0) + 1
      }
    }
    toks.flatMap { case (id, ts) =>
      val covered = Array.fill(ts.length)(false)
      (0 to ts.length - L).foreach { i =>
        if (occ(ts.slice(i, i + L).mkString(" ")) >= 2)
          (i until i + L).foreach(covered(_) = true)
      }
      if (!covered.contains(true)) None
      else {
        // merged maximal covered runs
        val runs = scala.collection.mutable.Buffer[Int]()
        var cur = 0
        covered.foreach { c =>
          if (c) cur += 1
          else if (cur > 0) { runs += cur; cur = 0 }
        }
        if (cur > 0) runs += cur
        Some(id -> (ts.length, runs.sum.toLong, runs.length.toLong,
          runs.max.toLong))
      }
    }.toMap
  }

  private def run(docs: Seq[(Long, String)])
      : Map[Long, (Int, Long, Long, Long)] = {
    val sess = spark; import sess.implicits._
    val tmp = Files.createTempDirectory("graft_substrdup").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    TextOps.qDocSubstrdup(spark, tmp).collect().map { r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_tokens"),
        r.getAs[Long]("dup_tokens"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("longest_span")))
    }.toMap
  }

  private def words(seed: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"w${seed}_$i")

  test("planted repeats: cross-doc run, nested shorter repeat, " +
      "overlapping within-doc repeat, sub-threshold run ignored") {
    val shared = words(1, 25)            // 25-token run shared by A and B
    val nestedCore = shared.slice(5, 5 + L) // inner L-run also in doc D
    val subThresh = words(2, L - 1)      // L-1 tokens shared: BELOW bound
    val selfRep = words(3, L)            // repeats twice inside doc E
    val docA = (words(10, 8) ++ shared ++ words(11, 7)).mkString(" ")
    val docB = (words(12, 3) ++ shared ++ subThresh).mkString(" ")
    val docC = (words(13, 20) ++ subThresh ++ words(14, 6)).mkString(" ")
    val docD = (nestedCore ++ words(15, 9)).mkString(" ")
    // overlapping coverage: selfRep twice with a 4-token gap — windows
    // overlap mid-doc, the union must not double count
    val docE = (selfRep ++ words(16, 4) ++ selfRep).mkString(" ")
    val docF = words(17, 40).mkString(" ") // unique filler, never flagged
    val docs = Seq(1L -> docA, 2L -> docB, 3L -> docC, 4L -> docD,
      5L -> docE, 6L -> docF)
    val want = reference(docs)
    val got = run(docs)
    assert(got == want, s"got $got\nwant $want")
    // the invariants the construction plants, asserted directly too:
    assert(got.contains(1L) && got.contains(2L), "shared 25-run flagged")
    assert(!got.contains(3L) && !got.contains(6L),
      "sub-threshold and unique docs stay clean")
    assert(got(4L)._2 == L, "nested doc covers exactly its L-run")
    // doc E: both selfRep copies covered (2L tokens over 2 spans split
    // by the 4-token gap > 0 … gap is 4 < L so spans MERGE? positions
    // 0 and L+4: gap L+4 > L → two separate spans of L each
    assert(got(5L) == ((2 * L + 4, 2L * L, 2L, L.toLong)), s"${got(5L)}")
  }

  test("a doc duplicated verbatim is fully covered in one span; the " +
      "longest-run report equals the doc length") {
    val t = words(20, 30).mkString(" ")
    val got = run(Seq(1L -> t, 2L -> t, 3L -> words(21, 30).mkString(" ")))
    assert(got(1L) == ((30, 30L, 1L, 30L)) && got(2L) == got(1L))
    assert(!got.contains(3L))
  }

  /** Brute-force ExactSubstr REMOVAL: canonical window per duplicated
    * gram = min (doc_id, pos); a position is excised iff a non-canonical
    * duplicated window covers it and no canonical one does. */
  private def refClean(docs: Seq[(Long, String)])
      : Map[Long, (Int, Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split(" +").filter(_.nonEmpty) }
    val occ = scala.collection.mutable.Map[String,
      scala.collection.mutable.Buffer[(Long, Int)]]()
    toks.foreach { case (id, ts) =>
      (0 to ts.length - L).foreach { i =>
        occ.getOrElseUpdate(ts.slice(i, i + L).mkString(" "),
          scala.collection.mutable.Buffer()) += ((id, i))
      }
    }
    val canon = occ.values.filter(_.size >= 2).map(_.minBy(identity)).toSet
    val dupAll = occ.values.filter(_.size >= 2).flatten.toSet
    toks.map { case (id, ts) =>
      val rem = Array.fill(ts.length)(false)
      val keep = Array.fill(ts.length)(false)
      dupAll.filter(_._1 == id).foreach { case (_, p) =>
        if (canon((id, p))) (p until p + L).foreach(keep(_) = true)
        else (p until p + L).foreach(rem(_) = true)
      }
      val kept = ts.indices.filterNot(i => rem(i) && !keep(i)).map(ts)
      id -> ((ts.length, (ts.length - kept.length).toLong,
        kept.length.toLong, kept.mkString(" ")))
    }.toMap
  }

  private def runClean(docs: Seq[(Long, String)])
      : Map[Long, (Int, Long, Long, String)] = {
    val sess = spark; import sess.implicits._
    val tmp = Files.createTempDirectory("graft_substrclean").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    TextOps.qDocSubstrclean(spark, tmp).collect().map { r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_kept"),
        r.getAs[String]("clean_md5")))
    }.toMap
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
      .map("%02x".format(_)).mkString

  test("substring removal keeps the corpus-first copy, excises later " +
      "copies, collapses exact duplicates to empty, and leaves clean " +
      "docs untouched — against a brute-force reference") {
    val shared = words(30, 25)
    val selfRep = words(31, L)
    val docA = (words(32, 5) ++ shared ++ words(33, 6)).mkString(" ")
    val docB = (words(34, 4) ++ shared ++ words(35, 9)).mkString(" ")
    val docC = docA // verbatim duplicate of A → must clean to empty
    val docD = (selfRep ++ words(36, 6) ++ selfRep).mkString(" ")
    val docE = words(37, 40).mkString(" ") // untouched
    val docs = Seq(1L -> docA, 2L -> docB, 3L -> docC, 4L -> docD,
      5L -> docE)
    val want = refClean(docs).view.mapValues { case (n, r, k, clean) =>
      (n, r, k, md5hex(clean)) }.toMap
    val got = runClean(docs)
    assert(got == want, s"got $got\nwant $want")
    // the construction's own invariants, asserted directly:
    assert(got(1L)._2 == 0 && got(1L)._4 == md5hex(docA),
      "doc A holds every canonical copy — it must survive verbatim")
    assert(got(2L)._2 == 25, "doc B loses exactly the shared 25-run")
    assert(got(3L) == ((got(1L)._1, got(1L)._1.toLong, 0L, md5hex(""))),
      "the verbatim duplicate must clean to the empty string")
    assert(got(4L)._2 == L && got(4L)._3 == L + 6,
      "the within-doc second copy is excised, the first kept")
    assert(got(5L)._2 == 0 && got(5L)._4 == md5hex(docE))
  }

  test("cleaning conservation at sf0.001: n_kept + n_removed = n_tokens " +
      "everywhere, removals equal the dup-report's later-copy mass class") {
    val out = TextOps.qDocSubstrclean(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed")
        == r.getAs[Int]("n_tokens").toLong)
    }
    // some docs are rewritten at this SF (the corpus carries dups), and
    // every doc flagged clean by the detector stays untouched here
    val removedDocs = out.filter(_.getAs[Long]("n_removed") > 0)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(removedDocs.nonEmpty)
    val flagged = TextOps.qDocSubstrdup(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(removedDocs.subsetOf(flagged),
      "a doc can only lose tokens if the detector saw duplication in it")
  }

  test("winnowing: the lag/lead formula equals brute-force window-min " +
      "selection, the overlap guarantee holds, density near 2/(w+1)") {
    val sess = spark; import sess.implicits._
    val (k, w) = (TextOps.WinnowK, TextOps.WinnowW)
    def md5hex2(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    // brute force: a position is selected iff it is the min of SOME
    // length-w window (truncated at the ends, matching the capped-dist
    // formula), ties selecting every minimal position
    def brute(ts: Array[String]): Set[Int] = {
      val hs = (0 to ts.length - k)
        .map(i => md5hex2(ts.slice(i, i + k).mkString(" ")))
      val sel = scala.collection.mutable.Set[Int]()
      (-(w - 1) to hs.length - 1).foreach { j =>
        val lo = math.max(0, j); val hi = math.min(hs.length - 1, j + w - 1)
        if (lo <= hi) {
          val m = (lo to hi).map(hs).min
          (lo to hi).filter(i => hs(i) == m).foreach(sel += _)
        }
      }
      sel.toSet
    }
    val shared = words(50, w + k - 1 + 4) // past the guarantee threshold
    val docs = Seq(
      1L -> (words(51, 9) ++ shared ++ words(52, 7)).mkString(" "),
      2L -> (words(53, 5) ++ shared ++ words(54, 11)).mkString(" "),
      3L -> (0 until 60).map(i => s"t${(i * 37) % 23}").mkString(" "))
    val tmp = Files.createTempDirectory("graft_winnow").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val got = TextOps.qDocWinnow(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_selected"), r.getAs[String]("fp_md5")))).toMap
    docs.foreach { case (id, text) =>
      val ts = text.trim.split(" +")
      val hs = (0 to ts.length - k)
        .map(i => md5hex2(ts.slice(i, i + k).mkString(" ")))
      val sel = brute(ts).toSeq.sorted
      val fp = md5hex2(sel.map(i => s"$i:${hs(i)}").mkString("|"))
      assert(got(id) == ((hs.length.toLong, sel.length.toLong, fp)),
        s"doc $id: ${got(id)} vs (${hs.length}, ${sel.length}, $fp)")
    }
    // overlap guarantee: ≥ w+k−1 shared tokens ⇒ a shared fingerprint
    def fps(id: Long): Set[String] = {
      val ts = docs.toMap.apply(id).trim.split(" +")
      val hs = (0 to ts.length - k)
        .map(i => md5hex2(ts.slice(i, i + k).mkString(" ")))
      brute(ts).map(hs)
    }
    assert(fps(1L).intersect(fps(2L)).nonEmpty, "overlap guarantee broken")
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    // density: expected 2/(w+1) = 0.4; the sawtooth doc sits near it
    val d3 = got(3L)._2.toDouble / got(3L)._1
    assert(d3 > 0.2 && d3 < 0.65, s"density $d3 implausible")
  }

  test("corpus invariants at sf0.001: affected docs exist, coverage " +
      "bounded by doc length, spans consistent") {
    val out = TextOps.qDocSubstrdup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, dup, spans, longest) = (r.getAs[Int]("n_tokens"),
        r.getAs[Long]("dup_tokens"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("longest_span"))
      assert(dup >= L && dup <= n, s"coverage $dup outside [$L, $n]")
      assert(longest >= L && longest <= dup)
      assert(spans >= 1 && spans * L <= dup + (spans - 1) * L)
      assert(math.abs(r.getAs[Double]("dup_frac") -
        dup.toDouble / n) < 1e-12)
    }
  }
}
