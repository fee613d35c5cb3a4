package graft

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._

class DedupSpec extends GraftSpec {

  /** Brute-force token-set Jaccard over all pairs (test-side oracle). */
  private lazy val bruteJaccard: Map[(Long, Long), Double] = {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(TextOps.tokens(col("text"))).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    (for {
      (a, ta) <- toks; (b, tb) <- toks if a < b
      j = (ta & tb).size.toDouble / (ta | tb).size
    } yield (a, b) -> j).toMap
  }

  private lazy val minhashDecisions: Map[Long, (Long, Double)] =
    Dedup.qDedupMinhash(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("minhash decisions are precise: reported jaccard is the true jaccard") {
    assert(minhashDecisions.nonEmpty)
    minhashDecisions.foreach { case (doc, (dupOf, j)) =>
      assert(dupOf != doc)
      val key = if (dupOf < doc) (dupOf, doc) else (doc, dupOf)
      assert(math.abs(j - bruteJaccard(key)) < 1e-12,
        s"doc $doc dup_of $dupOf: reported $j vs brute ${bruteJaccard(key)}")
      assert(j >= 0.8)
    }
  }

  test("minhash marks every doc with an identical-token-set predecessor") {
    val docsWithTwin = bruteJaccard.filter(_._2 == 1.0).keySet.map(_._2)
    val missing = docsWithTwin.filterNot(minhashDecisions.contains)
    assert(missing.isEmpty, s"exact dups not marked: ${missing.take(5)}")
  }

  test("minhash recall vs brute force at j>=0.8 is high") {
    // a doc is a true duplicate if some smaller doc has jaccard >= 0.8 with it
    val truth = bruteJaccard.filter(_._2 >= 0.8).keySet.map(_._2)
    assert(truth.nonEmpty, "corpus should contain near-dup docs")
    val recall = truth.count(minhashDecisions.contains).toDouble / truth.size
    assert(recall >= 0.7, s"recall $recall too low (${truth.size} true dup docs)")
  }

  test("simhash decisions cover every doc with a hamming<=3 predecessor (pigeonhole)") {
    val fps = Dedup.simhash(Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decisions = Dedup.qDedupSimhash(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // guarantee: any doc with a smaller doc within hamming 3 gets a decision
    // (same fp → exact link; different fp → its rep pair shares a chunk)
    val owed = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield b).toSet
    val missing = owed.filterNot(decisions.contains)
    assert(missing.isEmpty, s"simhash missed dup docs: ${missing.take(5)}")
    // precision: reported hamming is the true hamming and clears the bar
    decisions.foreach { case (doc, (dupOf, h)) =>
      assert(dupOf < doc)
      assert(java.lang.Long.bitCount(fps(doc) ^ fps(dupOf)) == h && h <= 6)
    }
  }

  test("exact dedup keeps one representative per distinct text") {
    val out = Dedup.qDedupExact(spark, sf).collect()
    val nDistinct = Tables.documents(spark, sf).select("text").distinct().count()
    assert(out.length == nDistinct)
    assert(out.map(_.getAs[Long]("n_copies")).sum == Tables.documents(spark, sf).count())
  }

  /** Driver-side exact cosine over all embedding pairs (test oracle). */
  private lazy val bruteCosine: Map[(Long, Long), Double] = {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    (for {
      (a, va) <- vecs; (b, vb) <- vecs if a < b
    } yield {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < va.length) { dot += va(i) * vb(i); na += va(i) * va(i); nb += vb(i) * vb(i); i += 1 }
      (a, b) -> dot / (math.sqrt(na) * math.sqrt(nb))
    }).toMap
  }

  test("embed LSH pairs are precise and recall the exact anchor's pairs") {
    // precision: every LSH-found pair truly clears the cosine threshold
    val lshPairs = Dedup.qDedupEmbedLsh(spark, sf) // decisions (vec_id, dup_of)
    val pairs = lshPairs.collect().map(r => (r.getLong(1), r.getLong(0)))
    pairs.foreach { case (a, b) =>
      assert(a < b, s"decision must link to a smaller partner: ($a, $b)")
      assert(bruteCosine((a, b)) >= 0.4,
        s"pair ($a,$b) cosine ${bruteCosine((a, b))} below threshold")
    }
    // recall vs the exact label-bucket anchor (qDedupEmbed = all same-label
    // pairs >= 0.4): a doc the anchor marks dup must get an LSH decision.
    // Banding recall at cos 0.4 is ~0.94/pair (16 tables x 4 bits) and the
    // data is fixed + hyperplanes seeded, so this is deterministic.
    val anchorDupDocs = Dedup.qDedupEmbed(spark, sf).collect()
      .map(_.getAs[Long]("vec_b")).toSet
    assert(anchorDupDocs.nonEmpty, "anchor should find near-dup pairs")
    val decided = lshPairs.collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = anchorDupDocs.count(decided.contains).toDouble / anchorDupDocs.size
    assert(recall >= 0.5, s"embed LSH recall $recall vs exact anchor too low")
  }

  test("semantic (cluster-bucketed) dedup is precise and recalls the anchor") {
    val sem = Dedup.qDedupSemantic(spark, sf)
    val pairs = sem.collect().map(r => (r.getLong(1), r.getLong(0)))
    pairs.foreach { case (a, b) =>
      assert(a < b, s"decision must link to a smaller partner: ($a, $b)")
      assert(bruteCosine((a, b)) >= 0.4,
        s"pair ($a,$b) cosine ${bruteCosine((a, b))} below threshold")
    }
    val anchorDupDocs = Dedup.qDedupEmbed(spark, sf).collect()
      .map(_.getAs[Long]("vec_b")).toSet
    val decided = sem.collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = anchorDupDocs.count(decided.contains).toDouble / anchorDupDocs.size
    assert(recall >= 0.5, s"semantic dedup recall $recall vs exact anchor too low")
  }

  test("editdist-1 neighborhood join is COMPLETE vs brute force (the " +
      "oracle shares the candidate algorithm — this is the independent " +
      "check), incl. adversarial insert/delete/substitute/transpose") {
    import org.apache.spark.sql.functions._
    // brute force over the real sf corpus names
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_name").distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    val brute = scala.collection.mutable.Map[String, Long]()
    for (i <- names.indices; j <- (i + 1) until names.length
         if lev(names(i), names(j)) <= 1) {
      brute(names(i)) = brute.getOrElse(names(i), 0L) + 1
      brute(names(j)) = brute.getOrElse(names(j), 0L) + 1
    }
    val got = graft.operators.Dedup.qDedupEditdist(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute.toMap,
      s"neighborhood profile diverged from brute force " +
        s"(${got.size} vs ${brute.size} entities)")

    // adversarial shapes through the same candidate+verify pipeline:
    // insertion, deletion, substitution (must match), transposition and
    // double-substitution (ed=2 — must NOT), plus an exact duplicate
    // pair (distinct() collapses it: no self-match)
    val sp2 = spark; import sp2.implicits._
    val toy = Seq("abcd", "abxd", "abd", "abcde", "bacd", "axyd", "abcd")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ed").toString
    toy.toDF("c_name").write.parquet(s"$tmp/customer.parquet")
    val toyGot = graft.operators.Dedup.qDedupEditdist(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toyNames = toy.distinct
    val toyBrute = scala.collection.mutable.Map[String, Long]()
    for (i <- toyNames.indices; j <- (i + 1) until toyNames.length
         if lev(toyNames(i), toyNames(j)) <= 1) {
      toyBrute(toyNames(i)) = toyBrute.getOrElse(toyNames(i), 0L) + 1
      toyBrute(toyNames(j)) = toyBrute.getOrElse(toyNames(j), 0L) + 1
    }
    assert(toyGot == toyBrute.toMap, s"toy diverged: $toyGot vs $toyBrute")
    // sanity on the shapes themselves: abcd matches abxd (substitution),
    // abd (deletion), abcde (insertion) — and NOT bacd (transposition,
    // ed=2) or axyd (double substitution, ed=2); the duplicate "abcd"
    // collapses via distinct, so no self-pair inflates the count
    assert(toyGot("abcd") == 3, s"abcd neighbors: ${toyGot.get("abcd")}")
    assert(!toyGot.contains("bacd"),
      "transposition (ed=2) must not match at the ed<=1 threshold")
    graft.streaming.MirrorLoop.rmrf(new java.io.File(tmp))
  }
}
