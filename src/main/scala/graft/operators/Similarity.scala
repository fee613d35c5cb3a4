package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.E — similarity search over the `embeddings` table (64-dim float
  * vectors).
  *
  * Vector math is done with codegen'd higher-order functions (`zip_with` +
  * `aggregate`) over double-cast arrays — a strict left-fold, so the result
  * is deterministic and engine-comparable; no UDFs.
  *
  * Scale path: `qAnnBrute` is the exact baseline (O(n) per probe — fine for
  * one probe, not for n×n). `qAnnLsh` buckets vectors by random-hyperplane
  * signature so a probe only scans its own bucket: candidate set shrinks
  * ~2^bits× while recall stays high; the signature is computed in one
  * narrow map stage and the bucket lookup is a broadcast-able semi-join.
  */
object Similarity {

  /** Cast a float-array column to double for exact cross-engine math. */
  def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Strict left-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).withColumn("vec", asDouble(col("embedding")))

  /** Exact top-20 cosine neighbors of the probe vector (vec_id=0).
    * Output is ids+rank only: float-rounding-proof for the oracle compare. */
  def qAnnBrute(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, d)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("vec").as("probe_vec"))
    val top = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        cosine(col("vec"), col("probe_vec")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
    // rank assigned after the top-K cut: 20 rows, trivial window
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("rank"), col("vec_id"), col("label"))
  }

  def qAnnBruteSql: String =
    """SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank, vec_id, label
      |FROM (
      | SELECT e.vec_id, e.label,
      |  list_cosine_similarity(e.embedding::DOUBLE[], p.embedding::DOUBLE[]) AS cos
      | FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) p
      | WHERE e.vec_id <> 0)
      |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin

  /** Number of hyperplanes = signature bits. 8 bits ≈ 256 buckets. */
  val LshBits = 8

  /** Deterministic pseudorandom unit hyperplanes (seed fixed → same
    * signature on every executor / every run). */
  lazy val hyperplanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(LshBits, 64)(rnd.nextGaussian())
  }

  /** Signature = integer whose bit i is sign(v · h_i). Pure column expr. */
  def lshSignature(vec: Column): Column =
    (0 until LshBits).map { i =>
      val h = array(hyperplanes(i).map(lit).toIndexedSeq: _*)
      when(dot(vec, h) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: probe only scans its own hyperplane bucket.
    * Rows-only check; the spec measures recall vs qAnnBrute. */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d).withColumn("sig", lshSignature(col("vec")))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("vec").as("probe_vec"), col("sig").as("probe_sig"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .filter(col("sig") === col("probe_sig"))
      .select(col("vec_id"), col("label"),
        cosine(col("vec"), col("probe_vec")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
      .select(col("vec_id"), col("label"))
  }
}
