package graft

import graft.operators.{Dedup, Similarity, TextOps}
import org.apache.spark.sql.functions._

class AdvancedSpec extends GraftSpec {

  test("dup clusters equal union-find connected components of the decisions") {
    val edges = Dedup.qDedupMinhash(spark, sf)
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (doc, cl) =>
      assert(cl == truth(doc), s"doc $doc: cluster $cl vs union-find ${truth(doc)}")
    }
  }

  test("IVF ANN finds most of the brute-force top-20") {
    val brute = Similarity.qAnnBrute(spark, sf).collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = Similarity.qAnnIvf(spark, sf).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ivf.nonEmpty)
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall collapsed (nProbe=4/16 lists)")
  }

  test("tfidf matches a driver-side computation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" +").toSeq)
    val nDocs = docs.length.toDouble
    val df = docs.flatMap { case (_, ts) => ts.distinct }.groupBy(identity)
      .map { case (t, xs) => t -> xs.length }
    val expected = docs.map { case (id, ts) =>
      val tf = ts.groupBy(identity).map { case (t, xs) => t -> xs.length }
      val scored = tf.map { case (t, f) => (t, f * math.log(nDocs / df(t))) }
      // max by (tfidf, term) to mirror the query's deterministic tiebreak
      val best = scored.maxBy { case (t, s) => (s, t) }
      id -> best
    }.toMap
    val got = TextOps.qDocTfidf(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (term, score)) =>
      val (et, es) = expected(id)
      assert(term == et && math.abs(score - es) < 1e-9, s"doc $id: ($term,$score) vs ($et,$es)")
    }
  }
}
