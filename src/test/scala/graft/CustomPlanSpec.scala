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

  test("twoPhase equals single-phase; partial pass runs with NO exchange below it") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .repartition(7)
    val single = TopKPerGroup(orders, 3, "o_custkey", "o_totalprice", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val two = TopKPerGroup.twoPhase(orders, 3, "o_custkey", "o_totalprice", "o_orderkey")
    val twoSet = two.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(twoSet == single, s"two ${twoSet.size} vs single ${single.size}")
    // plan shape: partial exec (…, true) directly over the input partitions
    // — the ONLY exchange sits between partial and final, so the shuffle
    // carries per-partition survivors, never the full input
    // AQE's toString appends an "Initial Plan" trailer — assert on the
    // final plan section only
    val plan = two.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerGroup 3, o_custkey, o_totalprice, o_orderkey, true"),
      s"expected a partial TopKPerGroup in:\n${plan.take(800)}")
    val partialIdx = plan.indexOf("o_orderkey, true")
    assert(!plan.substring(partialIdx).contains("ENSURE_REQUIREMENTS"),
      "no distribution-satisfying exchange may sit below the partial pass")
  }

  test("regression: column pruning below the node must not drop the ordering column") {
    // a downstream select() of a SUBSET once let ColumnPruning insert a
    // Project below the node (the node's plain-string fields contributed
    // nothing to references), silently feeding the exec a child without
    // the order column — an unchecked UnsafeRow ordinal read made the cut
    // effectively random. references now declares the three columns and
    // the exec require()s them.
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
    val pruned = TopKPerGroup.twoPhase(orders, 3, "o_custkey", "o_totalprice", "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey")) // <- the pruning trigger
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = TopKPerGroup(orders, 3, "o_custkey", "o_totalprice", "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val window = Relational.qWindowRank(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == window, s"pruned select changed the kept rows")
    assert(full == window)
  }
}
