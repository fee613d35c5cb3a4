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

  test("minhash finds every identical-token-set pair and reports true jaccard") {
    val found = Dedup.qDedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical signatures are guaranteed candidates: every j=1.0 pair is found
    val exactPairs = bruteJaccard.filter(_._2 == 1.0).keySet
    val missing = exactPairs -- found.keySet
    assert(missing.isEmpty, s"minhash missed exact-dup pairs: ${missing.take(5)}")
    // every reported pair's jaccard matches brute force and clears the bar
    found.foreach { case (pair, j) =>
      assert(math.abs(j - bruteJaccard(pair)) < 1e-12)
      assert(j >= 0.8)
    }
  }

  test("minhash recall vs brute force at j>=0.8 is high") {
    val found = Dedup.qDedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = bruteJaccard.filter(_._2 >= 0.8).keySet
    assert(truth.nonEmpty, "corpus should contain near-dup pairs")
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.7, s"recall $recall too low (${truth.size} true pairs)")
  }

  test("simhash candidates include every hamming<=3 pair (pigeonhole)") {
    val fps = Dedup.simhash(Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reported = Dedup.qDedupSimhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val brute = for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b) -> h
    brute.foreach { case (pair, h) =>
      assert(reported.contains(pair), s"simhash missed pair $pair at hamming $h")
      assert(reported(pair) == h)
    }
    // and every reported hamming is correct
    reported.foreach { case ((a, b), h) =>
      assert(java.lang.Long.bitCount(fps(a) ^ fps(b)) == h && h <= 6)
    }
  }

  test("exact dedup keeps one representative per distinct text") {
    val out = Dedup.qDedupExact(spark, sf).collect()
    val nDistinct = Tables.documents(spark, sf).select("text").distinct().count()
    assert(out.length == nDistinct)
    assert(out.map(_.getAs[Long]("n_copies")).sum == Tables.documents(spark, sf).count())
  }
}
