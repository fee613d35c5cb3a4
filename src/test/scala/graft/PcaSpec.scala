package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** PCA: the one-pass distributed covariance equals the driver
  * computation, power iteration recovers planted principal axes with
  * their variances, components are orthonormal eigenvectors, and the
  * in-plan Catalyst projection matches the driver projection with the
  * eigenvalue variance spectrum. */
class PcaSpec extends GraftSpec {

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("planted anisotropic axes are recovered in order with their " +
      "variances; components orthonormal; Cv = λv") {
    val sp = spark; import sp.implicits._
    // deterministic 4-dim data: independent coordinates with variances
    // 9, 4, 1, 0.25 along rotated axes — the principal axes by design
    val rnd = new scala.util.Random(7)
    val axes = Array( // a fixed orthonormal basis of R^4 (Hadamard/2)
      Array(0.5, 0.5, 0.5, 0.5), Array(0.5, -0.5, 0.5, -0.5),
      Array(0.5, 0.5, -0.5, -0.5), Array(0.5, -0.5, -0.5, 0.5))
    val sds = Array(3.0, 2.0, 1.0, 0.5)
    val rows = (1 to 4000).map { i =>
      val c = Array.tabulate(4)(j => rnd.nextGaussian() * sds(j))
      val x = Array.tabulate(4)(dim =>
        10.0 + axes.indices.map(j => c(j) * axes(j)(dim)).sum)
      (i.toLong, x.map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(8)
    val m = Pca.fit(df, 4)
    // eigenvalues ≈ planted variances, descending
    m.eigenvalues.zip(sds.map(s => s * s)).foreach { case (l, v) =>
      assert(math.abs(l - v) / v < 0.15, s"eig $l vs planted $v") }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)))
    // components match the planted axes up to sign
    m.components.zip(axes).foreach { case (c, a) =>
      assert(math.abs(dot(c, a)) > 0.99,
        s"axis not recovered: |cos|=${math.abs(dot(c, a))}") }
    // orthonormal
    for (i <- 0 until 4; j <- 0 until 4) {
      val g = dot(m.components(i), m.components(j))
      assert(math.abs(g - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"gram($i,$j)=$g") }
    // true eigenvectors of the measured covariance: Cv = λv
    val (_, cov, _) = Pca.covariance(df)
    m.components.zip(m.eigenvalues).foreach { case (v, l) =>
      val cv = Array.tabulate(4)(i => dot(cov(i), v))
      val resid = math.sqrt(cv.zip(v).map { case (a, b) =>
        val e = a - l * b; e * e }.sum)
      assert(resid < 1e-6, s"eigen residual $resid at λ=$l")
    }
  }

  test("distributed covariance == driver reference; in-plan projection " +
      "== driver projection; projected variances = eigenvalues") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val local = df.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val d = local.head.length
    val n = local.length.toDouble
    val meanRef = Array.tabulate(d)(i => local.map(_(i)).sum / n)
    val (mean, cov, cnt) = Pca.covariance(df)
    assert(cnt == local.length.toLong)
    mean.zip(meanRef).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"mean diverged: $a vs $b") }
    // spot-check covariance entries against the driver reference
    for (i <- Seq(0, 3, d - 1); j <- Seq(0, 7, d - 1)) {
      val ref = local.map(x => (x(i) - meanRef(i)) * (x(j) - meanRef(j)))
        .sum / n
      assert(math.abs(cov(i)(j) - ref) < 1e-7,
        s"cov($i,$j) ${cov(i)(j)} vs $ref")
    }
    val k = 8
    val m = Pca.fit(df, k)
    val proj = Pca.project(df, m)
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // in-plan projection equals the driver dot products
    val byId = df.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    byId.foreach { case (id, x) =>
      val centered = x.zip(m.mean).map { case (a, b) => a - b }
      val ref = m.components.map(c => dot(centered, c))
      proj(id).zip(ref).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-8, s"proj($id) $a vs $b") }
    }
    // per-dimension variance of the projection = the eigenvalue
    val projArr = proj.values.toArray
    for (j <- 0 until k) {
      val col_j = projArr.map(_(j))
      val mu = col_j.sum / col_j.length
      val v = col_j.map(x => (x - mu) * (x - mu)).sum / col_j.length
      assert(math.abs(v - m.eigenvalues(j)) / m.eigenvalues(j) < 1e-6,
        s"projected variance $v vs λ_$j ${m.eigenvalues(j)}")
    }
    // the spectrum is worth compressing to: top-8 of 64 captures the
    // anisotropy the synthetic embeddings actually have (sanity, not a
    // tuned bound)
    assert(m.eigenvalues.head > 0)
  }
}
