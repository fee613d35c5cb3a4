package graft

import graft.operators.Relational
import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._

class CustomPlanSpec extends GraftSpec {

  test("custom TopKPerGroup plan matches the window formulation") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
    val custom = TopKPerGroup(orders, 3, "o_custkey", "o_totalprice", "o_orderkey")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val window = Relational.qWindowRank(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(custom == window,
      s"custom ${custom.size} rows vs window ${window.size}")
  }

  test("the physical plan contains the custom exec and a hash exchange on the key") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
    val df = TopKPerGroup(orders, 3, "o_custkey", "o_totalprice", "o_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"plan:\n${plan.take(600)}")
    assert(plan.contains("hashpartitioning(o_custkey"),
      "expected an exchange satisfying the ClusteredDistribution requirement")
  }

  test("works at higher parallelism than groups (distribution correctness)") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .repartition(16)
    val custom = TopKPerGroup(orders, 1, "o_custkey", "o_totalprice", "o_orderkey")
      .collect()
    // exactly one row per customer, and it is that customer's max
    val perCust = custom.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length == 1))
    val maxes = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(max("o_totalprice").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    custom.foreach(r => assert(r.getDouble(1) == maxes(r.getLong(0))))
  }
}
