package graft

import graft.operators.Relational

class RelationalSpec extends GraftSpec {

  test("q1_agg groups to the returnflag x linestatus lattice") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val qty = rows.map(_.getAs[Double]("sum_qty"))
    assert(qty.forall(_ > 0))
    // exact decimal arithmetic: sum_disc_price <= sum_base_price (discounts >= 0)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q3_join_agg returns top-10 in strictly descending revenue order") {
    val rows = Relational.q3JoinAgg(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q_sort_limit top-20 equals a full-sort cut") {
    val top = Relational.qSortLimit(spark, sf).collect().map(_.getLong(0))
    val full = Tables.orders(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("o_totalprice").desc,
        org.apache.spark.sql.functions.col("o_orderkey"))
      .limit(20).collect().map(_.getAs[Long]("o_orderkey"))
    assert(top.sameElements(full))
  }

  test("semi + anti partition the customer set") {
    val n = Tables.customer(spark, sf).count()
    val urgentCust = Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    val anti = Relational.qAntiJoin(spark, sf).count()
    assert(anti == n - urgentCust)
  }

  test("rollup includes the grand-total row") {
    val rows = Relational.qRollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_rows") == Tables.lineitem(spark, sf).count())
  }

  test("scalar subquery threshold filters strictly above the mean") {
    val rows = Relational.qScalarSubquery(spark, sf).collect()
    val prices = Tables.orders(spark, sf).select("o_totalprice").collect().map(_.getDouble(0))
    val mean = prices.sum / prices.length
    // decimal-exact mean may differ from float mean in the last ulp; allow slack
    assert(rows.forall(_.getAs[Double]("o_totalprice") > mean - 1e-6))
    assert(rows.length < prices.length)
  }
}
