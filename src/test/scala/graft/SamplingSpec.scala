package graft

import graft.operators.Relational2
import org.apache.spark.sql.functions._

class SamplingSpec extends GraftSpec {

  test("stratified sampling realizes per-stratum rates and is deterministic") {
    val totals = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.25, "3-MEDIUM" -> 0.1,
      "4-NOT SPECIFIED" -> 0.1, "5-LOW" -> 0.05)
    val s1 = Relational2.qSampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Relational2.qSampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2, "seeded sampling must be deterministic")
    s1.foreach { case (k, n) =>
      val expect = totals(k) * rates(k)
      // Bernoulli sampling: allow 4 sigma
      val sigma = math.sqrt(totals(k) * rates(k) * (1 - rates(k)))
      assert(math.abs(n - expect) <= 4 * sigma + 1,
        s"$k: sampled $n, expected ~$expect (sigma $sigma)")
    }
  }
}
