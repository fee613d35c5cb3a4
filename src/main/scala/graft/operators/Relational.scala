package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.A — relational/OLAP core over the star schema.
  *
  * Determinism discipline: every monetary aggregate is computed in
  * DECIMAL(12,4) (exact integer-scaled arithmetic — identical results on any
  * engine and any partitioning/accumulation order) and cast to double only in
  * the final projection. Float-summation drift would otherwise break both the
  * DuckDB hash-compare and cross-run reproducibility on a real cluster where
  * partition count changes the accumulation order.
  *
  * Scale discipline: dims are broadcast; facts shuffle on join keys;
  * aggregations are declarative (Catalyst emits map-side partial aggregates);
  * top-K goes through orderBy+limit → TakeOrderedAndProject (no global sort).
  */
object Relational {

  /** Exact decimal view of a double money/quantity column. */
  private def dec(c: Column): Column = c.cast("decimal(12,4)")
  private val oneD = lit(BigDecimal(1).setScale(4))

  /** Integer-scaled money math for product-sums (revenue, charge).
    *
    * Why not decimals end to end: a decimal product-sum at scale 8+ exceeds
    * 2^53 in unscaled magnitude, and DuckDB's wide-decimal→DOUBLE cast is
    * not correctly rounded (it diverges from the exact value in the last
    * ulp; Java's BigDecimal is exact-nearest) — so the engines disagree.
    *
    * Instead: per-row 10^4-scaled BIGINT terms (price < 10^10·10^4 and the
    * factor products stay < 2^63 per row — exact, engine-identical), integer-
    * divided back to 4 decimal digits per row (identical truncation), summed
    * exactly in DECIMAL(28,0) small enough that the final double conversion
    * is exact (< 2^53 up to ~sf50). The result is a precisely DEFINED number
    * ("per-item amount floored to 4 decimals, summed") that every engine
    * reproduces bit-identically. */
  /** Per-row revenue in exact 10^-4 units — THE single source of the
    * product-sum money discipline (shared with [[Relational2]]'s Q15). */
  private[operators] val Rev4Term: String =
    "CAST((CAST(round(l_extendedprice * 10000) AS BIGINT) * " +
      "(10000 - CAST(round(l_discount * 10000) AS BIGINT))) DIV 10000 " +
      "AS DECIMAL(28,0))"
  private[operators] val Rev4TermSql: String = Rev4Term.replace(" DIV ", " // ")
  private def revenueSum: Column =
    expr(s"CAST(sum($Rev4Term) AS DOUBLE) / 1e4")
  private val revenueSumSql: String =
    s"CAST(sum($Rev4TermSql) AS DOUBLE) / 1e4"
  private def chargeSum: Column =
    expr("CAST(sum(CAST((CAST(round(l_extendedprice * 10000) AS BIGINT) * " +
      "(10000 - CAST(round(l_discount * 10000) AS BIGINT)) * " +
      "(10000 + CAST(round(l_tax * 10000) AS BIGINT))) DIV 100000000 " +
      "AS DECIMAL(28,0))) AS DOUBLE) / 1e4")
  private val chargeSumSql: String =
    "CAST(sum(CAST((CAST(round(l_extendedprice * 10000) AS BIGINT) * " +
      "(10000 - CAST(round(l_discount * 10000) AS BIGINT)) * " +
      "(10000 + CAST(round(l_tax * 10000) AS BIGINT))) // 100000000 " +
      "AS DECIMAL(28,0))) AS DOUBLE) / 1e4"

  /** Pricing-summary aggregation (cf. TPC-H Q1 shape): grouped agg with
    * map-side combine; 4-6 output rows regardless of input scale. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        revenueSum.as("sum_disc_price"),
        chargeSum.as("sum_charge"),
        count(lit(1)).as("count_order"))

  def q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
      | $revenueSumSql AS sum_disc_price,
      | $chargeSumSql AS sum_charge,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + narrow projection — both pushed into the parquet
    * scan (PushedFilters + 3-column ReadSchema). */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") < 5 && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))

  def q2FilterProjectSql: String =
    "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_quantity < 5 AND l_discount > 0.05"

  /** 3-way join + agg + top-N (cf. TPC-H Q3 shape). customer SCALES WITH THE
    * DATA (billions of rows at 100 TB), so it carries NO broadcast hint: AQE
    * broadcasts it when its runtime size fits (as at test scale — PlanSpec
    * asserts this) and degrades to a shuffle join when it doesn't, instead of
    * OOMing on a forced broadcast. orders⋈lineitem shuffles on orderkey. */
  def q3JoinAgg(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, d)
    val li   = Tables.lineitem(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(revenueSum.as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  def q3JoinAggSql: String =
    s"""SELECT o_orderkey, o_orderdate,
      | $revenueSumSql AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** 6-table join (cf. TPC-H Q5 shape): region/nation are BOUNDED dims (25 /
    * 5 rows at any SF) and keep explicit broadcast hints; customer and
    * supplier SCALE WITH THE DATA and carry none — AQE broadcasts them while
    * they fit and falls back to shuffle joins at cluster scale. The two fact
    * tables meet in one shuffle join on orderkey. */
  def q5MultiJoin(s: SparkSession, d: String): DataFrame = {
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
    val cust = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val ord = Tables.orders(s, d)
    val li  = Tables.lineitem(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey")
        && cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenueSum.as("revenue"))
  }

  def q5MultiJoinSql: String =
    s"""SELECT n_name,
      | $revenueSumSql AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  /** Highly selective scan-aggregate (cf. TPC-H Q6): the whole query is one
    * pushed-down scan + partial agg; no shuffle beyond the 1-row exchange. */
  def q6SelectiveAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(expr("CAST(sum(CAST((CAST(round(l_extendedprice * 10000) AS BIGINT) * " +
          "CAST(round(l_discount * 10000) AS BIGINT)) DIV 10000 " +
          "AS DECIMAL(28,0))) AS DOUBLE) / 1e4").as("revenue"),
        count(lit(1)).as("n_items"))

  def q6SelectiveAggSql: String =
    """SELECT CAST(sum(CAST((CAST(round(l_extendedprice * 10000) AS BIGINT) * CAST(round(l_discount * 10000) AS BIGINT)) // 10000 AS DECIMAL(28,0))) AS DOUBLE) / 1e4 AS revenue,
      | count(*) AS n_items
      |FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Global top-K without a global sort: TakeOrderedAndProject keeps K rows
    * per partition then merges — O(K) memory at any scale. */
  def qSortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  def qSortLimitSql: String =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"

  /** Exact distinct aggregation (expands to two-phase agg under Catalyst). */
  def qDistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))

  def qDistinctAggSql: String =
    "SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n_customers FROM customer GROUP BY c_mktsegment"

  /** HLL-sketch distinct — the 100 TB path where exact distinct would
    * shuffle every key. Rows-only check (sketch estimates are
    * engine-specific by design). */
  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        count(lit(1)).as("n_rows"))

  /** Window ranking: top-3 orders per customer by price (row_number with a
    * total tiebreak → deterministic at any parallelism). */
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  def qWindowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) t WHERE rn <= 3""".stripMargin

  /** Running (prefix) aggregation + lag over an ordered per-key window. */
  def qWindowRunning(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"),
        lag(col("o_totalprice"), 1).over(wl).as("prev_price"))
  }

  def qWindowRunningSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      | lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
      |FROM orders""".stripMargin

  /** Hierarchical ROLLUP (flag → flag+status → grand total). */
  def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))

  def qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty, count(*) AS n_rows
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** GROUPING SETS — two independent aggregation lattices in one pass. */
  def qGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_li_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty, count(*) AS n_rows
        |FROM graft_li_gs GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
  }

  def qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty, count(*) AS n_rows
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin

  /** Left-semi join (EXISTS): customers that have at least one order.
    * Semi-join keeps the build side to just the key column. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  def qSemiJoinSql: String =
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"

  /** Left-anti join (NOT EXISTS): customers with no urgent order. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  def qAntiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin

  /** Left-outer join + null-fill: per-customer order counts including
    * order-less customers. */
  def qOuterJoin(s: SparkSession, d: String): DataFrame = {
    val ordAgg = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("tot"))
    val cust = Tables.customer(s, d)
    cust.join(ordAgg, cust("c_custkey") === ordAgg("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("tot").cast("double"), lit(0.0)).as("total_spend"))
  }

  def qOuterJoinSql: String =
    """SELECT c_custkey, coalesce(cnt, 0) AS n_orders,
      | coalesce(CAST(tot AS DOUBLE), 0.0) AS total_spend
      |FROM customer LEFT JOIN (
      | SELECT o_custkey, count(*) AS cnt, sum(CAST(o_totalprice AS DECIMAL(12,4))) AS tot
      | FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey""".stripMargin

  /** Set union (distinct) of two heterogeneous filters. */
  def qUnionAll(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val a = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val b = ord.filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    a.union(b).distinct()
  }

  def qUnionAllSql: String =
    """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION
      |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000.0""".stripMargin

  /** Conditional aggregation — manual pivot of order counts by status. */
  def qCasePivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))

  def qCasePivotSql: String =
    """SELECT o_orderpriority,
      | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Post-aggregation filter (HAVING). */
  def qHaving(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 15)

  def qHavingSql: String =
    "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey HAVING count(*) >= 15"

  /** Scalar subquery: orders above the global average price. The average is
    * computed exactly (decimal sum / count) so the threshold is identical on
    * every engine. */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val avgRow = ord.agg(
      (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
    ord.join(broadcast(avgRow))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  def qScalarSubquerySql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / count(*) FROM orders)""".stripMargin

  /** String function suite on part. */
  def qStringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%a%"))
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("name5"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"))

  def qStringFuncsSql: String =
    """SELECT p_partkey, upper(substr(p_name, 1, 5)) AS name5,
      | p_brand || '-' || p_type AS brand_type, length(p_name) AS name_len
      |FROM part WHERE p_name LIKE '%a%'""".stripMargin

  /** Date bucketing: per-year/month order stats. */
  def qDateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("month_total"))

  def qDateFuncsSql: String =
    """SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
      | CAST(extract(month FROM o_orderdate) AS INT) AS o_month,
      | count(*) AS n_orders,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS month_total
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** TPC-H Q4 shape — order-priority checking: orders of a half-year with
    * at least one LATE line (shipped > 60 days after the order date),
    * counted per priority. The EXISTS carries a CROSS-TABLE predicate, so
    * the semi-join condition is (key equality AND date comparison) — a
    * correlated-EXISTS decorrelation, one shuffle semi-join, never a
    * count-then-filter subquery. */
  def q4Priority(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1996-07-01"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, ord("o_orderkey") === li("l_orderkey")
        && li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  def q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q19 shape — disjunctive (OR-of-ANDs) predicate over a
    * fact⋈dim join: three brand/size/quantity bands, revenue over the
    * union. The showcase is predicate STRUCTURE: Catalyst's CNF
    * conversion pushes the part-only disjunction down to the part scan,
    * so the join sees pre-filtered parts instead of filtering after. */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    def band(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .filter(band("Brand#12", 15, 1, 11)
        || band("Brand#13", 25, 10, 20)
        || band("Brand#14", 35, 20, 30))
      .agg(revenueSum.as("revenue"), count(lit(1)).as("n_items"))
  }

  def q19DisjunctiveSql: String =
    s"""SELECT $revenueSumSql AS revenue, count(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q17 shape — small-quantity-order revenue: lineitems of one
    * brand's parts whose quantity is below 0.2× that part's average
    * quantity. The correlated aggregate subquery decorrelates to a
    * per-part aggregate joined back to the fact — with the decorrelation
    * SCOPED to the keys the outer query consumes: lineitem is semi-joined
    * to the brand's partkeys FIRST, so the per-part aggregate runs over
    * only the ~4% of rows whose averages are needed (every lineitem of a
    * kept partkey survives the semi-join, so each per-part average is
    * bit-identical to the all-parts computation). Both the aggregate and
    * the outer fact read the same scoped subtree, shuffled on partkey once
    * (reusable exchange; no hint on part — size-driven, it scales).
    * Determinism: the per-part average is exact DECIMAL sum / count,
    * double only at the comparison; the revenue sum is DECIMAL until the
    * final /7 projection (float partial-sum order never moves the
    * result). */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val brandParts = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"))
    val liBrand = li.join(brandParts,
      li("l_partkey") === brandParts("p_partkey"), "left_semi")
    val perPart = liBrand.groupBy(col("l_partkey").as("p_partkey"))
      .agg((sum(col("l_quantity").cast("decimal(12,4)")).cast("double")
        / count(lit(1))).as("avg_qty"))
    liBrand.join(perPart, liBrand("l_partkey") === perPart("p_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
      .agg((sum(col("l_extendedprice").cast("decimal(12,4)")).cast("double")
        / 7.0).as("avg_yearly"))
  }

  def q17SmallQtySql: String =
    """WITH pp AS (SELECT l_partkey AS p_partkey,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)
      |    / count(*) AS DOUBLE) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / 7.0
      |  AS avg_yearly
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#23'
      |JOIN pp ON l.l_partkey = pp.p_partkey
      |WHERE l.l_quantity < pp.avg_qty * 0.2""".stripMargin
}
