package graft

import graft.operators.{MomentsDelta, Pca}
import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Maintained moment statistics: after any mix of insert/update/delete
  * waves folded through the change feed, the maintained (n, Σx, Σxxᵀ)
  * equals a recompute from the live table (n exactly; sums to 1e-9
  * relative — the subtractive float fold's spec-bounded drift), the
  * derived model follows, replays no-op past the cursor, and the
  * streamed form matches. */
class MomentsDeltaSpec extends GraftSpec {

  private def relErr(a: Array[Double], b: Array[Double]): Double = {
    val scale = math.max(1e-12,
      math.max(a.map(math.abs).max, b.map(math.abs).max))
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max / scale
  }

  test("maintained moments == recompute across insert/update/delete " +
      "waves; model refreshes with zero table reads; replay no-ops") {
    val sp = spark; import sp.implicits._
    val tmp = Files.createTempDirectory("graft_momdelta").toString
    val src = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
      .repartition(4).write.parquet(s"$tmp/landing")
    src.ingest(s"$tmp/landing")
    val root = s"$tmp/moments"
    MomentsDelta.bootstrap(spark, src.ledgerDir, root)

    def check(tag: String): Unit = {
      val (n, s, ss) = MomentsDelta.moments(spark, root)
      val (rn, rs, rss) = Pca.rawMoments(src.read())
      assert(n == rn, s"$tag: n $n vs recompute $rn")
      assert(relErr(s, rs) < 1e-9, s"$tag: Σx drifted ${relErr(s, rs)}")
      assert(relErr(ss, rss) < 1e-9, s"$tag: Σxxᵀ drifted ${relErr(ss, rss)}")
    }
    check("bootstrap")

    val dim = src.read().select(size(col("embedding"))).head().getInt(0)
    val maxId = src.read().agg(max(col("vec_id"))).head().getLong(0)

    // wave 1: inserts
    val fresh = (1 to 7).map { i =>
      (maxId + i, (0 until dim).map(j =>
        (((i * 29 + j * 13) % 11) - 5).toFloat / 4f))
    }.toDF("vec_id", "embedding")
    src.merge(fresh, "vec_id", changeFeed = true)
    MomentsDelta.applyRound(spark, src.ledgerDir, root)
    check("insert wave")

    // wave 2: updates (pre-image subtracts, post-image adds)
    val scaled = src.read().orderBy(col("vec_id")).limit(5)
      .select(col("vec_id"),
        transform(col("embedding"), v => v * lit(3.0f) + lit(0.5f))
          .as("embedding"))
    src.merge(scaled, "vec_id", changeFeed = true)
    MomentsDelta.applyRound(spark, src.ledgerDir, root)
    check("update wave")

    // wave 3: deletes
    src.merge(src.read().orderBy(col("vec_id").desc).limit(4)
        .select(col("vec_id"), col("embedding")),
      "vec_id", deleteWhen = Some(lit(true)), changeFeed = true)
    MomentsDelta.applyRound(spark, src.ledgerDir, root)
    check("delete wave")

    // wave 4: mixed in ONE round (insert + update + delete batches fold
    // together; the per-row additive identity needs no key resolution)
    src.merge(Seq((maxId + 100, (0 until dim).map(_ => 0.25f)))
      .toDF("vec_id", "embedding"), "vec_id", changeFeed = true)
    src.merge(src.read().filter(col("vec_id") === maxId + 1)
        .select(col("vec_id"),
          transform(col("embedding"), v => -v).as("embedding")),
      "vec_id", changeFeed = true)
    src.merge(src.read().filter(col("vec_id") === maxId + 2)
        .select(col("vec_id"), col("embedding")),
      "vec_id", deleteWhen = Some(lit(true)), changeFeed = true)
    MomentsDelta.applyRound(spark, src.ledgerDir, root)
    check("mixed catch-up wave")

    // replay: nothing new past the cursor → state untouched
    val before = MomentsDelta.moments(spark, root)
    MomentsDelta.applyRound(spark, src.ledgerDir, root)
    val after = MomentsDelta.moments(spark, root)
    assert(before._1 == after._1 && before._2.sameElements(after._2)
      && before._3.sameElements(after._3), "replay changed the state")

    // the maintained model equals the from-scratch fit (same mean/cov
    // up to the spec drift bound → identical deterministic eigensolve
    // to the same tolerance)
    val mModel = MomentsDelta.model(spark, root, k = 4)
    val fModel = Pca.fit(src.read(), k = 4)
    mModel.eigenvalues.zip(fModel.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
        s"maintained eigenvalue $a vs fresh $b") }

    // streamed form: one more wave folds through maintainStream and the
    // state still matches the recompute
    src.merge(Seq((maxId + 200, (0 until dim).map(j => (j % 3 - 1).toFloat)))
      .toDF("vec_id", "embedding"), "vec_id", changeFeed = true)
    MomentsDelta.maintainStream(spark, src.ledgerDir, root, s"$tmp/ckpt")
      .awaitTermination()
    check("streamed wave")
    graft.streaming.MirrorLoop.rmrf(new java.io.File(tmp))
  }
}
