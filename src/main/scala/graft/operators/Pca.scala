package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction step the
  * similarity toolkit was missing (PQ quantizes, IVF buckets; PCA is how
  * a pipeline WHITENS or compresses embeddings before either, and the
  * standard pre-rotation OPQ-style quantizers apply). Spark-first split
  * of the work by where it belongs:
  *
  *  - the DATA-SCALED part is ONE pass: per-partition accumulation of
  *    (n, Σx, Σxxᵀ) — d(d+1) doubles of state for d-dim vectors, a
  *    map-side combine with no shuffle at all (partials collect to the
  *    driver; 32 partitions × ~33 KB for d=64). The table is never
  *    rescanned per component or per iteration.
  *  - the EIGENSOLVE runs on the DRIVER over the d×d covariance (KB —
  *    the §3 control-plane exception, the IVF-centroid discipline):
  *    deterministic power iteration with deflation (seeded init, fixed
  *    iteration count, Gram-Schmidt re-orthogonalization per step).
  *  - PROJECTION goes back IN-PLAN as a pure Catalyst expression: the
  *    k component vectors become array literals broadcast inside the
  *    plan, each output coordinate one `aggregate(zip_with(...))` dot —
  *    codegen'd, no UDF, no shuffle.
  */
object Pca {

  final case class Model(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
  }

  /** One-pass (mean, covariance, n) of `embCol` (array<float/double>).
    * Covariance is the biased (1/n) form — the eigen-spectrum scale the
    * variance checks use. */
  def covariance(emb: DataFrame, embCol: String = "embedding")
      : (Array[Double], Array[Array[Double]], Long) = {
    val sp = emb.sparkSession
    import sp.implicits._
    val parts = emb
      .select(transform(col(embCol), v => v.cast("double")).as("v"))
      .as[Array[Double]]
      .mapPartitions { it =>
        var n = 0L; var s: Array[Double] = null; var ss: Array[Double] = null
        it.foreach { x =>
          if (s == null) { s = new Array[Double](x.length)
            ss = new Array[Double](x.length * x.length) }
          var i = 0
          while (i < x.length) {
            s(i) += x(i)
            var j = 0
            val base = i * x.length
            while (j < x.length) { ss(base + j) += x(i) * x(j); j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single((n, s.toSeq, ss.toSeq))
      }
      .collect() // ≤ #partitions rows of d(d+1)+1 doubles — KB-scale
    require(parts.nonEmpty, "empty embedding set")
    val d = parts.head._2.size
    val (n, s, ss) = (new Array[Double](1), new Array[Double](d),
      new Array[Double](d * d))
    parts.foreach { case (pn, ps, pss) =>
      n(0) += pn.toDouble
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { ss(i) += pss(i); i += 1 }
    }
    val nn = n(0)
    val mean = s.map(_ / nn)
    val cov = Array.tabulate(d, d)((i, j) =>
      ss(i * d + j) / nn - mean(i) * mean(j))
    (mean, cov, nn.toLong)
  }

  /** Top-`k` principal components by deterministic power iteration with
    * deflation (driver-side over the d×d covariance). */
  def fit(emb: DataFrame, k: Int, iters: Int = 100,
      embCol: String = "embedding"): Model = {
    val (mean, cov, _) = covariance(emb, embCol)
    val d = mean.length
    require(k >= 1 && k <= d, s"k=$k out of range for d=$d")
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += cov(i)(j) * v(j); j += 1 }
        s
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val comps = new Array[Array[Double]](k)
    val eigs = new Array[Double](k)
    val rnd = new scala.util.Random(42)
    for (c <- 0 until k) {
      var v = Array.fill(d)(rnd.nextDouble() - 0.5)
      var it = 0
      while (it < iters) {
        v = matVec(v)
        // deflate: project out the components already found
        var p = 0
        while (p < c) {
          val pr = dot(v, comps(p))
          var i = 0
          while (i < d) { v(i) -= pr * comps(p)(i); i += 1 }
          p += 1
        }
        val nrm = math.sqrt(dot(v, v))
        require(nrm > 0, s"power iteration collapsed at component $c")
        v = v.map(_ / nrm)
        it += 1
      }
      comps(c) = v
      eigs(c) = dot(v, matVec(v))
    }
    Model(mean, comps, eigs)
  }

  /** In-plan projection: `embCol` → `outCol` as the k-dim array of
    * centered dots with the model's components — pure Catalyst
    * (array-literal broadcast + aggregate/zip_with dots), codegen'd. */
  def projectCol(embCol: Column, model: Model): Column = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(transform(embCol, v => v.cast("double")),
      meanLit, (a, b) => a - b)
    val dots = model.components.map { comp =>
      aggregate(zip_with(centered, typedLit(comp.toSeq), (a, b) => a * b),
        lit(0.0), _ + _)
    }
    array(dots.toIndexedSeq: _*)
  }

  /** Dataset-level convenience: (vec_id, projected k-dim vector). */
  def project(emb: DataFrame, model: Model,
      embCol: String = "embedding", outCol: String = "proj"): DataFrame =
    emb.withColumn(outCol, projectCol(col(embCol), model))

  /** Driver-gate entry ([rows] — float eigensolves are not
    * SQL-oracle-able; PcaSpec carries the correctness proof): fit the
    * top-8 components of the embeddings table (one covariance pass +
    * driver eigensolve) and project every vector in-plan. Output is
    * (vec_id, 6-dp projection) — rounded so the driver's hash stays
    * stable across codegen fusion orders. */
  def qEmbPca(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val model = fit(emb, k = 8)
    project(emb, model)
      .select(col("vec_id"),
        transform(col("proj"), v => round(v, 6)).as("proj"))
      .orderBy(col("vec_id"))
  }
}
