package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._

/** Product quantization: the 32×-compressed ADC read path must stay close
  * to exact brute force after the bounded re-rank, the index must have the
  * declared shape, and the corpus scoring pass must read ONLY the codes. */
class PqSpec extends GraftSpec {

  test("PQ index shape: PqM·PqK codebook rows with norms, tinyint codes") {
    val idx = Pq.pqIndexDir(spark, sf)
    val books = spark.read.parquet(s"$idx/codebooks")
    assert(books.count() == Pq.PqM * Pq.PqK)
    // persisted cnorm2 matches the centroid's own norm²
    val bad = books.filter(
      abs(aggregate(transform(col("centroid"), x => x * x), lit(0.0), _ + _)
        - col("cnorm2")) > 1e-12).count()
    assert(bad == 0, "persisted cnorm2 diverges from the centroid norm")
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.count() ==
      spark.read.parquet(s"$sf/embeddings.parquet").count())
    import org.apache.spark.sql.types._
    assert(codes.schema("pq_codes").dataType ==
      ArrayType(ByteType, containsNull = false) ||
      codes.schema("pq_codes").dataType ==
      ArrayType(ByteType, containsNull = true),
      s"codes must be tinyint arrays: ${codes.schema("pq_codes").dataType}")
    // every code addresses a real codebook entry
    val oob = codes.filter(exists(col("pq_codes"),
      c => c < 0 || c >= Pq.PqK)).count()
    assert(oob == 0, "code index out of codebook range")
  }

  test("PQ ANN: recall vs exact brute force, exact-precision ranking") {
    val brute = Similarity.qAnnBrute(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val pq = Pq.qAnnPq(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val recall = brute.values.count(pq.values.toSet).toDouble / brute.size
    assert(recall >= 0.7, s"PQ recall $recall < 0.7 vs exact top-20")
    // the final ranking is EXACT-precision over the candidates: any
    // neighbor both lists share in the same rank slot carries the same id,
    // and the shared ids rank in the same relative (exact cosine) order
    val sharedOrderPq = pq.toSeq.sortBy(_._1).map(_._2)
      .filter(brute.values.toSet)
    val sharedOrderBrute = brute.toSeq.sortBy(_._1).map(_._2)
      .filter(pq.values.toSet)
    assert(sharedOrderPq == sharedOrderBrute,
      "shared neighbors must rank in the same exact-cosine order")
  }

  test("batched PQ ANN: mean recall vs the exact batched baseline") {
    val exact = Similarity.qAnnBatch(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        (p, rs.map(_.getLong(2)).toSet)
      }
    val pq = Pq.qAnnPqBatch(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        (p, rs.map(_.getLong(2)).toSet)
      }
    val recalls = exact.map { case (p, ex) =>
      (ex & pq.getOrElse(p, Set.empty)).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"batched PQ mean recall $mean < 0.6")
  }

  test("ADC corpus pass reads ONLY pq_codes; re-rank fetch is bounded") {
    val plan = Pq.qAnnPq(spark, sf).queryExecution.executedPlan.toString
    val codesScans = plan.linesIterator
      .filter(l => l.contains("Scan parquet") && l.contains("graft_pq_"))
      .filter(_.contains("/codes"))
      .toSeq
    assert(codesScans.nonEmpty, s"no codes scan found:\n$plan")
    assert(!codesScans.exists(_.contains("embedding")),
      s"codes scan must not touch full precision:\n${codesScans.mkString("\n")}")
    // the approximate-cosine math happens over codes, so the embeddings
    // table is only scanned for the probe row and the candidate fetch
    assert(plan.contains("pq_codes"), "ADC pass must score on pq_codes")
  }
}
