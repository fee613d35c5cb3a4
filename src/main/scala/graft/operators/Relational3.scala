package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.A continued — the remaining TPC-H join/ratio shapes expressible on
  * this corpus (no partsupp table, no shipmode/receiptdate columns, so
  * Q12's ship-mode analysis is honestly out; Q16's part-supplier relation
  * comes from observed lineitem pairs instead, Q9's per-unit supply cost
  * is proxied by `p_retailprice`, and the same observed-pairs discipline
  * gives Q2 a min-OBSERVED-price-per-pair cost relation and Q11 a
  * revenue-valued inventory — same join topologies, same decorrelation
  * algebra).
  *
  * Money discipline is [[Relational]]'s: per-row 10^4-scaled BIGINT
  * product terms (`Rev4Term`), summed in DECIMAL(28,0), double only in
  * the final projection; RATIO queries (Q8/Q14) divide two such exact
  * doubles in the same textual op order on both engines — IEEE division
  * on identical operands is bit-identical. Bounded dims (nation, region —
  * ≤25 rows at any SF) keep explicit broadcast hints; customer, supplier,
  * part and every fact SCALE WITH DATA and carry none (SURVEY §3.1).
  */
object Relational3 {

  import Relational.{Rev4Term, Rev4TermSql}

  private def revenueSum: Column = expr(s"CAST(sum($Rev4Term) AS DOUBLE) / 1e4")
  private val revenueSumSql: String = s"CAST(sum($Rev4TermSql) AS DOUBLE) / 1e4"

  /** TPC-H Q7 shape — volume shipping between trading nations: revenue by
    * (supplier nation, customer nation, ship year) for CROSS-nation trade
    * over two years. The classic query pins one nation pair; this corpus
    * has 10-100 suppliers at test SFs (a fixed pair degenerates to zero
    * rows), so the shape keeps ALL pairs — output stays bounded at
    * 25×24×years regardless of data scale, and a pair filter would fold
    * into the broadcast nation dims anyway. Spark-first shape: nation
    * broadcasts into supplier/customer, lineitem⋈orders shuffles on
    * orderkey once, map-side-combinable final agg. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(s, d)
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .select(col("c_custkey"), col("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(revenueSum.as("revenue"))
  }

  def q7VolumeShippingSql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       | $revenueSumSql AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         CAST(year(l_shipdate) AS INT) AS l_year,
       |         l_extendedprice, l_discount
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
       |    AND n1.n_name <> n2.n_name
       |)
       |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 shape — national market share: of the ECONOMY-part order
    * volume bought by customers in region AMERICA over two years, the
    * fraction supplied by NATION_3, per order year. The share is a ratio
    * of two EXACT integer-unit sums (numerator = CASE-guarded Rev4Term),
    * divided as doubles in identical op order on both engines. The part
    * filter reaches the lineitem side as a semi-join (only matching
    * partkeys shuffle); region→nation folds to a 5-row broadcast key set;
    * customer stays hint-free. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val amNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(s, d)
      .join(broadcast(amNations), col("c_nationkey") === col("n_nationkey"),
        "left_semi")
      .select(col("c_custkey"))
    val supNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val parts = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    Tables.lineitem(s, d)
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01")
            && col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((expr(s"CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN $Rev4Term" +
          s" ELSE CAST(0 AS DECIMAL(28,0)) END) AS DOUBLE)")
        / expr(s"CAST(sum($Rev4Term) AS DOUBLE)")).as("mkt_share"))
  }

  def q8MarketShareSql: String =
    s"""SELECT o_year,
       |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN $Rev4TermSql
       |    ELSE CAST(0 AS DECIMAL(28,0)) END) AS DOUBLE)
       |  / CAST(sum($Rev4TermSql) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |         n1.n_name AS supp_nation, l_extendedprice, l_discount
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  JOIN region ON n2.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       |)
       |GROUP BY o_year""".stripMargin

  /** TPC-H Q10 shape — returned-item reporting: the top-20 customers by
    * revenue lost to returns ('R' lineitems) for one order quarter. The
    * returnflag filter pushes to the lineitem scan and the quarter filter
    * to the orders scan BEFORE their orderkey shuffle; nation broadcasts;
    * customer joins hint-free; the top-20 compiles to
    * TakeOrderedAndProject (no global sort). Deterministic cut: revenue
    * is the exact integer-unit sum, tie-broken on custkey. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1996-04-01"))
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenueSum.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
  }

  def q10ReturnedItemsSql: String =
    s"""SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM (
       |  SELECT c_custkey, c_name, c_acctbal, n_name,
       |    $revenueSumSql AS revenue
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  WHERE l_returnflag = 'R'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY c_custkey, c_name, c_acctbal, n_name
       |)
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q14 shape — promotion-revenue share for one ship month: the
    * percentage of revenue from PROMO-type parts. One fact⋈part join
    * (month filter pushed to the lineitem scan, part hint-free), the
    * CASE-guarded numerator and the denominator computed in ONE aggregate
    * pass, ratio as `num_double * 100.0 / den_double` in identical op
    * order on both engines. */
  def q14PromoShare(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-03-01")
        && col("l_shipdate") < lit("1996-04-01"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg((expr(s"CAST(sum(CASE WHEN p_type = 'PROMO' THEN $Rev4Term" +
          s" ELSE CAST(0 AS DECIMAL(28,0)) END) AS DOUBLE) * 100.0")
        / expr(s"CAST(sum($Rev4Term) AS DOUBLE)")).as("promo_revenue"))

  def q14PromoShareSql: String =
    s"""SELECT
       |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $Rev4TermSql
       |    ELSE CAST(0 AS DECIMAL(28,0)) END) AS DOUBLE) * 100.0
       |  / CAST(sum($Rev4TermSql) AS DOUBLE) AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  /** TPC-H Q16 shape — supplier count by part attribute: distinct
    * suppliers able to supply each surviving (brand, type, size) group.
    * This corpus has no partsupp table, so the part-supplier relation is
    * the DISTINCT (l_partkey, l_suppkey) pairs observed in lineitem —
    * same query shape, one extra map-side-combined distinct. The part
    * attribute filters push to the part scan; the pair relation and part
    * meet in one partkey shuffle; countDistinct is per-group exact. */
  def q16SupplierCnt(s: SparkSession, d: String): DataFrame = {
    val ps = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "MEDIUM"
        && col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .join(ps, col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** lead/lag coverage — per-customer order cadence: for every order, the
    * days since that customer's previous order and until the next one
    * (sequence edges are null). Scale shape: the window partitions by
    * CUSTKEY — parallelism = customer count, partition width = orders per
    * customer (bounded), never a global sort. Deterministic frame order:
    * (o_orderdate, o_orderkey) — the date alone can tie. Timestamps are
    * midnight-aligned in this corpus, so Spark's datediff (date-cast) and
    * DuckDB's date_diff('day') agree exactly. */
  def qWindowLeadLag(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"),
        datediff(lead(col("o_orderdate"), 1).over(w),
          col("o_orderdate")).as("days_to_next"))
      .select(col("o_custkey"), col("o_orderkey"),
        col("days_since_prev"), col("days_to_next"))
  }

  def qWindowLeadLagSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day',
      |    lag(o_orderdate, 1) OVER w, o_orderdate) AS INT) AS days_since_prev,
      |  CAST(date_diff('day',
      |    o_orderdate, lead(o_orderdate, 1) OVER w) AS INT) AS days_to_next
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** ntile / percent_rank / cume_dist coverage — monthly price quartiles
    * by order priority: each order's quartile and exact rank fractions
    * within its (priority, order month) cohort. Scale shape: the
    * partition KEY CARDINALITY is the parallelism dial for rank windows
    * (priority × month here; a coarser key serializes into few sorted
    * partitions — global quantiles belong to q_percentile/
    * q_approx_percentile instead). Fully ordered frame (price, orderkey)
    * so every rank function is deterministic; percent_rank/cume_dist are
    * exact small-integer ratios — bit-identical across engines. */
  def qWindowNtile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("o_orderpriority"), col("o_month"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("o_month", date_trunc("month", col("o_orderdate")))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_month"),
        ntile(4).over(w).as("price_quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  def qWindowNtileSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  date_trunc('month', o_orderdate) AS o_month,
      |  CAST(ntile(4) OVER w AS INT) AS price_quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority, date_trunc('month', o_orderdate)
      |             ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** Frame-bound window coverage — first/last/nth-value and a trailing
    * ROWS frame, the value-navigation family lead/lag/ntile don't touch.
    * Explicit frames on BOTH engines (default frames differ between
    * growing and full-partition functions); the deterministic
    * (price, orderkey) order keeps every navigated value unique. Money
    * values pass through as exact DECIMAL copies (no arithmetic); only
    * the trailing sum computes, cast double in the final projection
    * (≤3 bounded values — exact in double). One shuffle on the partition
    * keys serves all four windows (same partitioning + ordering). */
  def qWindowFrames(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Window
      .partitionBy(col("o_orderpriority"), col("o_month"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = base.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val trail = base.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("o_month", date_trunc("month", col("o_orderdate")))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_month"),
        first(col("o_totalprice")).over(base).as("cheapest"),
        last(col("o_totalprice")).over(full).as("priciest"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_cheapest"),
        sum(col("o_totalprice")).over(trail).cast("double").as("trail3_sum"))
  }

  def qWindowFramesSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  date_trunc('month', o_orderdate) AS o_month,
      |  first_value(o_totalprice) OVER w AS cheapest,
      |  last_value(o_totalprice) OVER wf AS priciest,
      |  nth_value(o_totalprice, 2) OVER wf AS second_cheapest,
      |  CAST(sum(o_totalprice) OVER wt AS DOUBLE) AS trail3_sum
      |FROM orders
      |WINDOW
      |  w AS (PARTITION BY o_orderpriority, date_trunc('month', o_orderdate)
      |        ORDER BY o_totalprice, o_orderkey),
      |  wf AS (PARTITION BY o_orderpriority, date_trunc('month', o_orderdate)
      |         ORDER BY o_totalprice, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |  wt AS (PARTITION BY o_orderpriority, date_trunc('month', o_orderdate)
      |         ORDER BY o_totalprice, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Distribution-rank window coverage — percent_rank + cume_dist, the
    * two relative-position functions the rank/ntile/frames family leaves
    * untested: each customer's exact standing within its (segment,
    * nation) balance distribution. Both are ratios of exact integers
    * ((rank−1)/(n−1), rows≤/n) divided in identical op order on both
    * engines — IEEE division on identical operands is bit-identical, so
    * they oracle exactly; (balance, custkey) ordering is deterministic.
    * Partitioning is (segment, nation) — 125 bounded-fraction frames.
    * CORPUS-scaled distribution ranks (one global frame) are the KLL
    * sketch path's job (q_doc_len_quantiles), not a window's: a single
    * window partition over 100 TB is one task sorting the corpus. */
  def qWindowDist(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"), col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  def qWindowDistSql: String =
    """SELECT c_custkey, c_mktsegment, c_nationkey,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment, c_nationkey
      |             ORDER BY c_acctbal, c_custkey)""".stripMargin

  /** Statistical moments the profile report doesn't cover — per-group
    * VARIANCE, STDDEV, COVARIANCE and CORRELATION of quantity vs price —
    * computed CROSS-ENGINE-EXACTLY: never the engines' corr/covar/stddev
    * aggregates (their floating co-moment accumulation order differs run
    * to run and engine to engine), but the closed forms over EXACT
    * integer-unit power sums (Σx, Σy, Σx², Σy², Σxy in 10^-4 units,
    * DECIMAL(28,0) — lineitem products bounded ≤5e14/row) with ONE
    * double expression per statistic in identical op order at the end.
    * The aggregate is one map-side-combined pass; output bounded at the
    * group count. */
  def qStatMoments(s: SparkSession, d: String): DataFrame = {
    val x = "CAST(round(l_quantity * 10000) AS BIGINT)"
    val y = "CAST(round(l_extendedprice * 10000) AS BIGINT)"
    def dec(e: String) = s"CAST($e AS DECIMAL(28,0))"
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr(s"sum(${dec(x)})").as("sx"), expr(s"sum(${dec(y)})").as("sy"),
        expr(s"sum(${dec(s"$x * $x")})").as("sxx"),
        expr(s"sum(${dec(s"$y * $y")})").as("syy"),
        expr(s"sum(${dec(s"$x * $y")})").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        expr("CAST((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS DOUBLE) / 1e8").as("var_qty"),
        expr("sqrt(CAST((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS DOUBLE) / 1e8)").as("std_qty"),
        expr("CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS DOUBLE) / 1e8").as("cov_qty_price"),
        expr("CAST(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS DOUBLE) / sqrt(CAST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS DOUBLE) * CAST(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS DOUBLE))").as("corr_qty_price"))
  }

  def qStatMomentsSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(CAST(round(l_quantity * 10000) AS BIGINT) AS DECIMAL(28,0))) AS sx,
      |    sum(CAST(CAST(round(l_extendedprice * 10000) AS BIGINT) AS DECIMAL(28,0))) AS sy,
      |    sum(CAST(CAST(round(l_quantity * 10000) AS BIGINT) * CAST(round(l_quantity * 10000) AS BIGINT) AS DECIMAL(28,0))) AS sxx,
      |    sum(CAST(CAST(round(l_extendedprice * 10000) AS BIGINT) * CAST(round(l_extendedprice * 10000) AS BIGINT) AS DECIMAL(28,0))) AS syy,
      |    sum(CAST(CAST(round(l_quantity * 10000) AS BIGINT) * CAST(round(l_extendedprice * 10000) AS BIGINT) AS DECIMAL(28,0))) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  CAST((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS DOUBLE) / 1e8 AS var_qty,
      |  sqrt(CAST((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS DOUBLE) / 1e8) AS std_qty,
      |  CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS DOUBLE) / 1e8 AS cov_qty_price,
      |  CAST(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS DOUBLE) / sqrt(CAST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS DOUBLE) * CAST(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS DOUBLE)) AS corr_qty_price
      |FROM m""".stripMargin

  /** Per-row PROFIT in exact 10^-4 units — the one money shape the other
    * TPC-H queries don't exercise: a DIFFERENCE of two scaled product
    * terms (revenue − cost). Both products are non-negative BIGINTs before
    * their DIV (Spark truncation ≡ DuckDB floor on non-negatives), so the
    * subtraction happens on already-truncated exact units; the difference
    * may go negative, which DECIMAL(28,0) carries exactly on both engines. */
  private val Profit4Term: String =
    "CAST(((CAST(round(l_extendedprice * 10000) AS BIGINT) * " +
      "(10000 - CAST(round(l_discount * 10000) AS BIGINT))) DIV 10000 - " +
      "(CAST(round(p_retailprice * 10000) AS BIGINT) * " +
      "CAST(round(l_quantity * 10000) AS BIGINT)) DIV 10000) " +
      "AS DECIMAL(28,0))"
  private val Profit4TermSql: String = Profit4Term.replace(" DIV ", " // ")

  /** TPC-H Q9 shape — product-type profit: for every line of a name-matched
    * part family, revenue minus supply cost, grouped by (supplier nation,
    * order year). No partsupp table in this corpus, so the per-unit cost is
    * the part's `p_retailprice` (cf. Q16's observed-pairs analog) — the
    * join topology (lineitem⋈part⋈orders⋈supplier⋈nation) and the
    * profit = revenue − cost·quantity algebra are the classic shape.
    * Spark-first: the name filter prunes part BEFORE its partkey shuffle
    * (the filter reaches the part scan), orders joins on the orderkey
    * shuffle lineitem already needs, supplier/part stay hint-free
    * (SURVEY §3.1 — they scale with data; AQE size-drives them), nation
    * broadcasts (bounded ≤25 rows). Output is bounded at nations×years. */
  def q9Profit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").contains("gear"))
          .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(expr(s"CAST(sum($Profit4Term) AS DOUBLE) / 1e4").as("profit"))

  def q9ProfitSql: String =
    s"""SELECT nation, o_year, CAST(sum($Profit4TermSql) AS DOUBLE) / 1e4 AS profit
       |FROM (
       |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |         l_extendedprice, l_discount, l_quantity, p_retailprice
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%gear%'
       |)
       |GROUP BY nation, o_year""".stripMargin

  def q16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q2 shape — min-cost supplier per part: for parts in a size
    * family, the EUROPE-region supplier(s) achieving the part's minimum
    * supply cost, reported by supplier balance. No partsupp, so the cost
    * relation is min OBSERVED l_extendedprice per distinct (part,
    * supplier) lineitem pair (cf. Q16's observed-pairs discipline) — an
    * exact DECIMAL copy, no arithmetic. The classic correlated
    * `cost = (SELECT min(cost) … WHERE region)` subquery decorrelates to
    * a WINDOW MIN over the already-aggregated, region-scoped pair frame
    * (partition width = suppliers-per-part — bounded small at any SF; the
    * q20 discipline: window over aggregates, never over raw facts).
    * Spark-first: the size filter prunes part BEFORE its partkey join
    * (only p_partkey survives, so the join IS the semi-join), lineitem
    * shuffles once on the pair key for the aggregate, supplier joins
    * hint-free (scales with data), nation⋈region folds to a broadcast
    * ≤25-row map. Deterministic top-100 (acctbal desc, name, part) —
    * TakeOrderedAndProject, no global sort. */
  def q2MincostSupp(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val partKeys = Tables.part(s, d)
      .filter(col("p_size").isin(5, 15, 25, 35, 45))
      .select(col("p_partkey"))
    val eurSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val pairs = Tables.lineitem(s, d)
      .join(partKeys, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost"))
    val scoped = pairs.join(eurSupp, col("l_suppkey") === col("s_suppkey"))
    scoped
      .withColumn("mc", min(col("cost"))
        .over(Window.partitionBy(col("p_partkey"))))
      .filter(col("cost") === col("mc"))
      .select(col("p_partkey"), col("s_name"), col("n_name"),
        col("s_acctbal"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  def q2MincostSuppSql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey
      |), scoped AS (
      |  SELECT p_partkey, s_name, n_name, s_acctbal, cost
      |  FROM cost
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'EUROPE' AND p_size IN (5, 15, 25, 35, 45)
      |)
      |SELECT p_partkey, s_name, n_name, s_acctbal, cost FROM (
      |  SELECT *, min(cost) OVER (PARTITION BY p_partkey) AS mc FROM scoped)
      |WHERE cost = mc
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q11 shape — important-stock identification: parts whose
    * revenue value among ASIA-region suppliers exceeds TWICE the average
    * part's, i.e. the group-share HAVING against a GLOBAL scalar. No
    * partsupp availqty, so a part's "stock value" is its exact
    * 10^-4-unit revenue over lines supplied by the region (Rev4Term).
    * The classic `HAVING sum(...) > (SELECT sum(...) * fraction)` scalar
    * subquery decorrelates to one per-part aggregate + a 1-row total
    * broadcast (the q22 discipline), and the share test MULTIPLIES —
    * `val4·nparts > 2·tot4`, all exact BIGINT 10^-4 units on both
    * engines — instead of comparing against a divided average whose
    * rounding could flip a borderline part. (Width budget: unit sums fit
    * BIGINT through the tested SFs with ~10^5 headroom; at warehouse
    * scale the same shape lifts to DECIMAL(38,0) on the Spark side.)
    * Spark-first: region→nation folds to a broadcast key set into
    * supplier (hint-free — it scales), lineitem shuffles once on partkey,
    * the total is a second tiny aggregate over the per-part frame. */
  def q11TopShare(s: SparkSession, d: String): DataFrame = {
    val asiaSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(s, d)
      .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(expr(s"CAST(sum(${Relational.Rev4Term}) AS BIGINT)").as("val4"))
    val totals = perPart
      .agg(sum(col("val4")).as("tot4"), count(lit(1)).as("nparts"))
    perPart.crossJoin(broadcast(totals))
      .filter(col("val4") * col("nparts") > col("tot4") * lit(2L))
      .select(col("l_partkey"),
        (col("val4").cast("double") / 1e4).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  def q11TopShareSql: String =
    s"""WITH pv AS (
       |  SELECT l_partkey, CAST(sum(${Relational.Rev4TermSql}) AS BIGINT) AS val4
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |  JOIN region ON r_regionkey = n_regionkey
       |  WHERE r_name = 'ASIA'
       |  GROUP BY l_partkey
       |), t AS (
       |  SELECT CAST(sum(val4) AS BIGINT) AS tot4,
       |         CAST(count(*) AS BIGINT) AS nparts FROM pv
       |)
       |SELECT l_partkey, CAST(val4 AS DOUBLE) / 1e4 AS value
       |FROM pv, t
       |WHERE val4 * nparts > 2 * tot4
       |ORDER BY value DESC, l_partkey""".stripMargin

  // -------------------------------------------------------------------
  // q12_late_lines — TPC-H Q12 shape, the last classic: shipping-delay
  // priority audit. The canonical query counts high/low-priority orders
  // per l_shipmode among late lines; this corpus carries no
  // shipmode/commit/receipt dates, so the mode dimension becomes
  // l_linestatus and lateness becomes shipped >= 30 days after the
  // order date (the q21 lateness discipline) inside one ship-year.
  // Spark-first shape: the ship-year window pushes to the LINEITEM
  // scan; the cross-table lateness predicate evaluates after the single
  // orderkey shuffle join; both CASE-sums fold in ONE map-side-combined
  // aggregate; output bounded at the status count. Dates are
  // midnight-aligned timestamps, so Spark datediff == DuckDB
  // date_diff('day') exactly (the q_window_leadlag discipline); counts
  // are exact integers — the oracle is exact.
  // -------------------------------------------------------------------
  def q12LateLines(s: SparkSession, d: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")) >= 30)
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  def q12LateLinesSql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND date_diff('day', CAST(o_orderdate AS DATE),
      |        CAST(l_shipdate AS DATE)) >= 30
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin
}
