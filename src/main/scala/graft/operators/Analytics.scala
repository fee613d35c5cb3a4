package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.A/§2.B widening — reporting and data-quality analytics: the
  * referential-integrity audit a star-schema lake runs after every load
  * (cf. /root/reference/file_transfer_scripts/insert_extra_fields.py:1-37 —
  * the reference's ingest pipeline validates metadata before handoff; the
  * relational analog is validating the keys), the UNPIVOT/melt report
  * shape, time-series gap filling (zero-fill + forward-fill — the
  * monitoring-dashboard primitive over an event stream with quiet hours),
  * and cohort retention (the user-lifecycle report every event warehouse
  * serves).
  */
object Analytics {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,4)")

  // -------------------------------------------------------------------
  // q_fk_check — referential-integrity audit over every FK edge of the
  // star schema (the post-load validation pass; this corpus is consistent,
  // so the report is all-zeros — AnalyticsSpec proves nonzero detection on
  // injected-dirty data). Each edge is ONE pass over the child relation
  // left-joined to the parent's distinct key set (hint-free: dims
  // AQE-broadcast, the fact-to-fact edges shuffle on the key once); output
  // is bounded at one row per edge at any scale.
  // -------------------------------------------------------------------

  /** One FK edge's audit row: child row count + rows whose `key` has no
    * match in `parent.pkey` (NULL keys count as orphans — a null FK cannot
    * reference anything). */
  def fkEdge(name: String, child: DataFrame, key: String,
      parent: DataFrame, pkey: String): DataFrame =
    fkEdges(child, Seq((name, key, parent, pkey)))

  /** ALL of one child table's FK edges from a SINGLE child scan: the
    * parent left-joins chain off one pass (each parent's distinct key set
    * joins on its own key — dims AQE-broadcast, a fact-sized parent
    * shuffles the chain on that key once), ONE aggregate computes every
    * edge's orphan count, and a `stack` melt emits one row per edge.
    * n_rows is identical across a child's edges by construction (each
    * join adds ≤1 hit flag per distinct parent key — never a fanout). A
    * 100 TB post-load audit must not scan the fact once per edge. */
  def fkEdges(child: DataFrame,
      edges: Seq[(String, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty)
    val keys = edges.map(_._2).distinct.map(col)
    val joined = edges.zipWithIndex.foldLeft(child.select(keys: _*)) {
      case (acc, ((_, key, parent, pkey), i)) =>
        acc.join(
          parent.select(col(pkey)).distinct().withColumn(s"__hit$i", lit(1)),
          col(key) === col(pkey), "left").drop(pkey)
    }
    val aggs = count(lit(1)).as("n_rows") +:
      edges.indices.map(i =>
        count(when(col(s"__hit$i").isNull, 1)).as(s"__orph$i"))
    val wide = joined.agg(aggs.head, aggs.tail: _*)
    val stackArgs = edges.zipWithIndex
      .map { case ((name, _, _, _), i) => s"'$name', n_rows, __orph$i" }
      .mkString(", ")
    wide.selectExpr(
      s"stack(${edges.size}, $stackArgs) AS (fk_edge, n_rows, n_orphans)")
  }

  def qFkCheck(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
    val c = Tables.customer(s, d); val p = Tables.part(s, d)
    val su = Tables.supplier(s, d); val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    val ev = Events.events(s, d)
    Seq(
      fkEdges(li, Seq(
        ("lineitem.l_orderkey->orders", "l_orderkey", o, "o_orderkey"),
        ("lineitem.l_partkey->part", "l_partkey", p, "p_partkey"),
        ("lineitem.l_suppkey->supplier", "l_suppkey", su, "s_suppkey"))),
      fkEdge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
      fkEdge("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
      fkEdge("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"),
      fkEdge("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"),
      fkEdge("events.user_id->customer", ev, "user_id", c, "c_custkey")
    ).reduce(_.unionAll(_))
  }

  def qFkCheckSql: String = {
    def e(name: String, child: String, key: String,
        parent: String, pkey: String): String =
      s"""SELECT '$name' AS fk_edge,
         | CAST(count(*) AS BIGINT) AS n_rows,
         | CAST(count(CASE WHEN p.$pkey IS NULL THEN 1 END) AS BIGINT) AS n_orphans
         |FROM $child c LEFT JOIN (SELECT DISTINCT $pkey FROM $parent) p
         |ON c.$key = p.$pkey""".stripMargin
    Seq(
      e("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      e("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      e("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      e("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      e("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      e("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      e("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
      e("events.user_id->customer", "events", "user_id", "customer", "c_custkey")
    ).mkString("\nUNION ALL\n")
  }

  // -------------------------------------------------------------------
  // q_unpivot — UNPIVOT/melt, the report shape q_pivot's inverse: a wide
  // per-segment metrics frame melted to (segment, metric, value) rows via
  // `stack` (codegen'd Generate — one pass, no join). All metrics cast to
  // DOUBLE only in the melt (counts are exact integers, money stays
  // DECIMAL(12,4) through the aggregate — the plain-money-sum rule).
  // -------------------------------------------------------------------
  def qUnpivot(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("double").as("n_cust"),
        sum(dec(col("c_acctbal"))).cast("double").as("sum_bal"),
        min(dec(col("c_acctbal"))).cast("double").as("min_bal"),
        max(dec(col("c_acctbal"))).cast("double").as("max_bal"))
    wide.select(col("c_mktsegment"),
      expr("""stack(4, 'n_cust', n_cust, 'sum_bal', sum_bal,
        'min_bal', min_bal, 'max_bal', max_bal) AS (metric, value)"""))
  }

  def qUnpivotSql: String =
    """WITH wide AS (
      | SELECT c_mktsegment,
      |  CAST(count(*) AS DOUBLE) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_bal,
      |  CAST(min(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS min_bal,
      |  CAST(max(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS max_bal
      | FROM customer GROUP BY 1)
      |SELECT c_mktsegment, 'n_cust' AS metric, n_cust AS value FROM wide
      |UNION ALL SELECT c_mktsegment, 'sum_bal', sum_bal FROM wide
      |UNION ALL SELECT c_mktsegment, 'min_bal', min_bal FROM wide
      |UNION ALL SELECT c_mktsegment, 'max_bal', max_bal FROM wide""".stripMargin

  // -------------------------------------------------------------------
  // q_profile — per-column data profiling (the DESCRIBE EXTENDED /
  // SUMMARIZE analog, the report a lake runs on every new table): one
  // row per column with non-null count, exact distinct count, and
  // min/max rendered to engine-portable strings (dates/longs verbatim;
  // money via DECIMAL so neither engine's double formatter is trusted).
  // ONE aggregate pass — the distinct counts share a single Expand
  // (bounded at #columns × rows, never per-column scans) — then a stack
  // melt to rows. Output bounded at #columns at any scale.
  // -------------------------------------------------------------------
  def qProfile(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    def str(c: org.apache.spark.sql.Column) = c.cast("string")
    val money = col("o_totalprice").cast("decimal(12,2)")
    val wide = o.agg(
      count(col("o_orderkey")).as("nn_orderkey"),
      countDistinct(col("o_orderkey")).as("nd_orderkey"),
      str(min(col("o_orderkey"))).as("mn_orderkey"),
      str(max(col("o_orderkey"))).as("mx_orderkey"),
      count(col("o_custkey")).as("nn_custkey"),
      countDistinct(col("o_custkey")).as("nd_custkey"),
      str(min(col("o_custkey"))).as("mn_custkey"),
      str(max(col("o_custkey"))).as("mx_custkey"),
      count(col("o_orderstatus")).as("nn_status"),
      countDistinct(col("o_orderstatus")).as("nd_status"),
      str(min(col("o_orderstatus"))).as("mn_status"),
      str(max(col("o_orderstatus"))).as("mx_status"),
      count(col("o_totalprice")).as("nn_price"),
      countDistinct(col("o_totalprice")).as("nd_price"),
      str(min(money)).as("mn_price"),
      str(max(money)).as("mx_price"),
      count(col("o_orderdate")).as("nn_date"),
      countDistinct(col("o_orderdate")).as("nd_date"),
      str(min(col("o_orderdate")).cast("date")).as("mn_date"),
      str(max(col("o_orderdate")).cast("date")).as("mx_date"),
      count(col("o_orderpriority")).as("nn_prio"),
      countDistinct(col("o_orderpriority")).as("nd_prio"),
      str(min(col("o_orderpriority"))).as("mn_prio"),
      str(max(col("o_orderpriority"))).as("mx_prio"))
    wide.select(expr(
      """stack(6,
        | 'o_orderkey', nn_orderkey, nd_orderkey, mn_orderkey, mx_orderkey,
        | 'o_custkey', nn_custkey, nd_custkey, mn_custkey, mx_custkey,
        | 'o_orderstatus', nn_status, nd_status, mn_status, mx_status,
        | 'o_totalprice', nn_price, nd_price, mn_price, mx_price,
        | 'o_orderdate', nn_date, nd_date, mn_date, mx_date,
        | 'o_orderpriority', nn_prio, nd_prio, mn_prio, mx_prio
        |) AS (column_name, n_nonnull, n_distinct, min_str, max_str)""".stripMargin))
  }

  def qProfileSql: String = {
    def block(c: String, minExpr: String, maxExpr: String): String =
      s"""SELECT '$c' AS column_name,
         | CAST(count($c) AS BIGINT) AS n_nonnull,
         | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         | CAST($minExpr AS VARCHAR) AS min_str,
         | CAST($maxExpr AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    Seq(
      block("o_orderkey", "min(o_orderkey)", "max(o_orderkey)"),
      block("o_custkey", "min(o_custkey)", "max(o_custkey)"),
      block("o_orderstatus", "min(o_orderstatus)", "max(o_orderstatus)"),
      block("o_totalprice",
        "min(CAST(o_totalprice AS DECIMAL(12,2)))",
        "max(CAST(o_totalprice AS DECIMAL(12,2)))"),
      block("o_orderdate",
        "CAST(min(o_orderdate) AS DATE)", "CAST(max(o_orderdate) AS DATE)"),
      block("o_orderpriority", "min(o_orderpriority)", "max(o_orderpriority)")
    ).mkString("\nUNION ALL\n")
  }

  // -------------------------------------------------------------------
  // q_evt_gapfill — time-series gap filling: the complete hour×type grid
  // over the stream's span with zero-filled counts/sums and a
  // forward-filled "last known hourly sum" (the dashboard line that must
  // not break over quiet hours). Scale shape: the grid is TIME-BOUNDED
  // (hours in span × event types — independent of event volume; the
  // q_evt_deadtime discipline), the hourly aggregate is the only
  // data-scaled pass (two-phase on (type, hour)), and the forward-fill
  // window partitions by type over grid-sized frames. Hour keys are epoch
  // integers; timestamps re-enter only via naive make_timestamp so the
  // oracle is timezone-free.
  // -------------------------------------------------------------------
  def qEvtGapfill(s: SparkSession, d: String): DataFrame = {
    val ev = Events.events(s, d)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 3600).as("h"),
        dec(col("value")).as("v"))
    val hourly = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"))
    val bounds = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val hours = bounds.select(explode(sequence(col("lo"), col("hi"))).as("h"))
    val grid = ev.select(col("event_type")).distinct().crossJoin(hours)
    val filled = grid.join(hourly, Seq("event_type", "h"), "left")
    val ffill = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .withColumn("ff", last(col("sv"), ignoreNulls = true).over(ffill))
      .select(col("event_type"),
        timestamp_seconds(col("h") * 3600).as("hour_start"),
        coalesce(col("cnt"), lit(0L)).as("n_events"),
        coalesce(col("sv"), lit(0).cast("decimal(12,4)")).cast("double").as("sum_value"),
        col("ff").cast("double").as("ffill_sum"))
  }

  def qEvtGapfillSql: String =
    """WITH ev AS (SELECT event_type,
      |  CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
      |  CAST(value AS DECIMAL(12,4)) AS v FROM events),
      |hourly AS (SELECT event_type, h, count(*) AS cnt, sum(v) AS sv
      | FROM ev GROUP BY 1, 2),
      |b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
      |hours AS (SELECT r.i AS h FROM b, unnest(range(b.lo, b.hi + 1)) AS r(i)),
      |grid AS (SELECT t.event_type, hours.h
      | FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN hours)
      |SELECT g.event_type,
      | make_timestamp(g.h * 3600 * 1000000) AS hour_start,
      | CAST(coalesce(cnt, 0) AS BIGINT) AS n_events,
      | CAST(coalesce(sv, 0) AS DOUBLE) AS sum_value,
      | CAST(last_value(sv IGNORE NULLS) OVER (
      |   PARTITION BY g.event_type ORDER BY g.h
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |  AS ffill_sum
      |FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type
      | AND g.h = hourly.h""".stripMargin

  // -------------------------------------------------------------------
  // q_evt_retention — cohort retention: users bucketed by their FIRST
  // active ISO week (the cohort), counted distinct in each later week as
  // (cohort_week, week_offset). Scale shape: one per-user min aggregate +
  // one distinct (user, week) pass (both two-phase key shuffles on
  // user_id); output bounded at weeks² regardless of event volume. The
  // offset divides a day difference of two week-truncated dates — exactly
  // divisible by 7, so integer division is identical on both engines.
  // -------------------------------------------------------------------
  def qEvtRetention(s: SparkSession, d: String): DataFrame = {
    val uw = Events.events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    uw.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  def qEvtRetentionSql: String =
    """WITH uw AS (SELECT DISTINCT user_id,
      |  CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |cohort AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
      |SELECT c.cohort_week,
      | CAST(date_diff('day', c.cohort_week, uw.wk) // 7 AS INT) AS week_offset,
      | CAST(count(DISTINCT uw.user_id) AS BIGINT) AS n_users
      |FROM uw JOIN cohort c ON uw.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // q_evt_m4 — M4 downsampling (Jugel et al., VLDB 2014): the
  // visualization-lossless time-series reduction every monitoring UI
  // should run SERVER-side — per (series, pixel-column bucket) keep
  // min, max, first and last, which is exactly the set of points a
  // line-rendering of that bucket can ever need; everything else cannot
  // change a pixel. Reduces any event volume to 4 values x bounded
  // buckets (hours-in-span x types — the q_evt_gapfill grid bound).
  // first/last are min_by/max_by(value, ord) over ONE sortless
  // map-side-combined HashAggregate (no window: a per-(type, hour)
  // row_number would SORT every event of a cell, and cell population
  // scales with data volume while the partition count stays time-bounded
  // — the per-cell sorts become the stragglers at 100x on exactly the
  // query whose purpose is reducing huge series). The ordering is the
  // (ts, event_id) pair packed into ONE exact DECIMAL(38,0)
  // (ts_micros * 10^18 + event_id): a STRUCT ordering demotes the whole
  // aggregate to SortAggregate (struct buffers aren't UnsafeRow-mutable),
  // while a wide decimal keeps the fixed-width hash buffer — the packing
  // is an order-preserving bijection whenever 0 <= event_id < 10^18 and
  // ts < year 5138 (10^20 us), both require()-able corpus invariants.
  // event_id disambiguates ts ties, so the pick is deterministic;
  // ts/event_id are non-null on every row (no row is excluded, so the
  // max_by null-seeding rule is moot here). Values pass through verbatim
  // (no arithmetic), so the oracle is exact; the oracle keeps the
  // equivalent window form.
  // -------------------------------------------------------------------
  def qEvtM4(s: SparkSession, d: String): DataFrame = {
    val ev = Events.events(s, d)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 3600).as("h"),
        col("ts"), col("event_id"), col("value"))
    val ord = (unix_micros(col("ts")).cast("decimal(20,0)")
      * lit(1000000000000000000L)) + col("event_id")
    ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("v_min"), max(col("value")).as("v_max"),
        min_by(col("value"), ord).as("v_first"),
        max_by(col("value"), ord).as("v_last"))
      .select(col("event_type"),
        timestamp_seconds(col("h") * 3600).as("hour_start"),
        col("n"), col("v_min"), col("v_max"), col("v_first"), col("v_last"))
  }

  def qEvtM4Sql: String =
    """WITH ev AS (SELECT event_type,
      |  CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, ts, event_id, value
      |  FROM events),
      |r AS (SELECT *,
      |  row_number() OVER (PARTITION BY event_type, h
      |    ORDER BY ts, event_id) AS rn,
      |  row_number() OVER (PARTITION BY event_type, h
      |    ORDER BY ts DESC, event_id DESC) AS rnd
      | FROM ev)
      |SELECT event_type,
      | make_timestamp(h * 3600 * 1000000) AS hour_start,
      | CAST(count(*) AS BIGINT) AS n,
      | min(value) AS v_min, max(value) AS v_max,
      | max(CASE WHEN rn = 1 THEN value END) AS v_first,
      | max(CASE WHEN rnd = 1 THEN value END) AS v_last
      |FROM r GROUP BY event_type, h""".stripMargin

  // -------------------------------------------------------------------
  // LTTB downsampling (q_evt_lttb) — M4's perceptual sibling: M4 keeps
  // the 4 pixel-exact extremes per bucket; LTTB (largest-triangle-three-
  // buckets) keeps the ONE point per bucket that preserves the line's
  // SHAPE (the point forming the largest triangle with its neighbor
  // buckets — the standard time-series downsampler). This is the
  // PARALLEL variant: anchors are the neighbor buckets' MEAN points
  // (canonical LTTB anchors on the previously SELECTED point — a
  // sequential chain no engine can parallelize exactly; mean-anchor LTTB
  // is the documented parallel form, with the next-bucket side already
  // canonical). Exactness discipline (the product-sum rule, pushed
  // through geometry): bucket means are RATIONAL (Σx, Σy4, n — exact
  // BIGINT sums of seconds + DECIMAL(12,4)-scaled values), and the
  // triangle-area argmax multiplies through by the positive common
  // denominator n_p²·n_n, leaving an EXACT integer score
  //   |(Σxp·nn − Σxn·np)(y·np − Σyp) − (Σxp − x·np)(Σyn·np − Σyp·nn)|
  // computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) after
  // translating x by the bucket start (area is translation-invariant —
  // algebraically cancelled, so the translation only SHRINKS the
  // integers; all widths fit 38 digits for |value| < 10^5, cell rows
  // < 10^6, neighbor span < 3 years — far beyond the corpus. A violated
  // bound would NULL the overflowing score — and a null on the true
  // max-area candidate would silently EXCLUDE it from the per-bucket
  // max/equality-join selection, a wrong pick rather than a failure
  // (DuckDB's HUGEINT errors instead, breaking parity asymmetrically) —
  // so the plan ASSERTS no interior row scored null before selecting;
  // the check rides the already-materialized checkpoint).
  // Selection is SORTLESS (the q_evt_m4 rule): per-bucket max(score),
  // an equality join back, then min_by over the packed (ts, event_id)
  // DECIMAL for deterministic ties. Edge buckets (no prev/next
  // anchor) keep their earliest/latest point — the global-endpoint
  // convention. Everything after the scan is bucket-bounded except one
  // broadcastable anchor join; values pass through verbatim.
  // -------------------------------------------------------------------
  def qEvtLttb(s: SparkSession, d: String): DataFrame = {
    val ev = Events.events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 1000000").as("xs"),
        expr("unix_micros(ts)").as("xus"),
        col("event_id"), col("value"),
        (col("value").cast("decimal(12,4)") * 10000).cast("long").as("v4"))
      .withColumn("h", expr("xs div 3600"))
    val anchors = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("xs")).as("sx"),
        sum(col("v4")).as("sy"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val nb = anchors.select(col("event_type"), col("h"),
      lag(col("n"), 1).over(w).as("np"),
      lag(col("sx"), 1).over(w).as("sxp0"),
      lag(col("sy"), 1).over(w).as("syp"),
      lead(col("n"), 1).over(w).as("nn"),
      lead(col("sx"), 1).over(w).as("sxn0"),
      lead(col("sy"), 1).over(w).as("syn"))
    val j = ev.join(nb, Seq("event_type", "h"))
    val start = col("h") * lit(3600L)
    def dec(c: org.apache.spark.sql.Column, p: Int) =
      c.cast(s"decimal($p,0)")
    val sxp = dec(col("sxp0") - col("np") * start, 20)
    val sxn = dec(col("sxn0") - col("nn") * start, 20)
    val xrel = dec(col("xs") - start, 20)
    val npD = dec(col("np"), 10)
    val nnD = dec(col("nn"), 10)
    val t1 = (sxp * nnD - sxn * npD) *
      (dec(col("v4"), 12) * npD - dec(col("syp"), 20))
    val t2 = (sxp - xrel * npD) *
      (dec(col("syn"), 20) * npD - dec(col("syp"), 20) * nnD)
    val score = when(col("np").isNotNull && col("nn").isNotNull,
      abs(t1 - t2))
    val pack = col("xus").cast("decimal(20,0)") *
      lit(1000000000000000000L) + col("event_id")
    val scored = j.withColumn("score", score).withColumn("pack", pack)
      .localCheckpoint() // feeds the max, the equality probe, and edges
    // overflow tripwire (see header comment): an interior row whose exact
    // integer score overflowed DECIMAL(38,0) nulls out and would silently
    // lose the argmax — refuse instead of picking wrong
    val overflowed = scored.filter(col("np").isNotNull
      && col("nn").isNotNull && col("score").isNull).count()
    if (overflowed > 0) sys.error(
      s"qEvtLttb: $overflowed interior rows overflowed the DECIMAL(38,0) " +
        "triangle score — input magnitudes exceed the documented bounds")
    val smax = scored.filter(col("score").isNotNull)
      .groupBy(col("event_type"), col("h"))
      .agg(max(col("score")).as("smax"))
    val selI = scored.join(smax, Seq("event_type", "h"))
      .filter(col("score") === col("smax"))
      .groupBy(col("event_type"), col("h"))
      .agg(min_by(col("xus"), col("pack")).as("sel_xus"),
        min_by(col("value"), col("pack")).as("sel_value"))
    val selFirst = scored.filter(col("np").isNull)
      .groupBy(col("event_type"), col("h"))
      .agg(min_by(col("xus"), col("pack")).as("sel_xus"),
        min_by(col("value"), col("pack")).as("sel_value"))
    val selLast = scored.filter(col("nn").isNull && col("np").isNotNull)
      .groupBy(col("event_type"), col("h"))
      .agg(max_by(col("xus"), col("pack")).as("sel_xus"),
        max_by(col("value"), col("pack")).as("sel_value"))
    selI.unionByName(selFirst).unionByName(selLast)
      .select(col("event_type"),
        timestamp_seconds(col("h") * 3600).as("hour_start"),
        expr("timestamp_micros(sel_xus)").as("sel_ts"),
        col("sel_value"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  /** DuckDB mirror of [[qEvtLttb]] — HUGEINT replays the exact integer
    * score; arg_min/arg_max over the same (ts, event_id) pack. */
  def qEvtLttbSql: String =
    """WITH ev AS (SELECT event_type,
      |  epoch_us(ts) // 1000000 AS xs, epoch_us(ts) AS xus,
      |  event_id, value,
      |  CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS HUGEINT) AS v4,
      |  (epoch_us(ts) // 1000000) // 3600 AS h
      |  FROM events),
      |anchors AS (SELECT event_type, h, CAST(count(*) AS HUGEINT) AS n,
      |  CAST(sum(xs) AS HUGEINT) AS sx, sum(v4) AS sy
      |  FROM ev GROUP BY 1, 2),
      |nb AS (SELECT event_type, h,
      |  lag(n) OVER w AS np, lag(sx) OVER w AS sxp0, lag(sy) OVER w AS syp,
      |  lead(n) OVER w AS nn, lead(sx) OVER w AS sxn0, lead(sy) OVER w AS syn
      |  FROM anchors WINDOW w AS (PARTITION BY event_type ORDER BY h)),
      |scored AS (SELECT ev.*, np, sxp0, syp, nn, sxn0, syn,
      |  CASE WHEN np IS NOT NULL AND nn IS NOT NULL THEN
      |    abs( ((sxp0 - np*(h*3600)) * nn - (sxn0 - nn*(h*3600)) * np)
      |         * (v4 * np - syp)
      |       - ((sxp0 - np*(h*3600)) - CAST(xs - h*3600 AS HUGEINT) * np)
      |         * (syn * np - syp * nn) )
      |  END AS score,
      |  CAST(xus AS HUGEINT) * 1000000000000000000 + event_id AS pack
      |  FROM ev JOIN nb USING (event_type, h)),
      |sel AS (
      |  SELECT event_type, h, arg_min(xus, pack) AS sel_xus,
      |    arg_min(value, pack) AS sel_value
      |  FROM (SELECT s.* FROM scored s
      |    JOIN (SELECT event_type, h, max(score) AS smax FROM scored
      |          WHERE score IS NOT NULL GROUP BY 1, 2) m
      |    USING (event_type, h)
      |    WHERE s.score = m.smax)
      |  GROUP BY 1, 2
      |  UNION ALL
      |  SELECT event_type, h, arg_min(xus, pack), arg_min(value, pack)
      |  FROM scored WHERE np IS NULL GROUP BY 1, 2
      |  UNION ALL
      |  SELECT event_type, h, arg_max(xus, pack), arg_max(value, pack)
      |  FROM scored WHERE nn IS NULL AND np IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, make_timestamp(h * 3600 * 1000000) AS hour_start,
      |  make_timestamp(sel_xus) AS sel_ts, sel_value
      |FROM sel ORDER BY event_type, hour_start""".stripMargin

  /** DISTRIBUTION-DRIFT report between two relations — per-bin counts of
    * a numeric column over a FIXED equal-width grid plus the Population
    * Stability Index, the dataset-shift alarm every ML data pipeline
    * monitors between corpus eras / table snapshots (PSI < 0.1 stable,
    * > 0.25 drifted, by convention). Determinism discipline: bin counts
    * are exact conditional-sum integers from ONE pass per side; PSI is
    * assembled as a SINGLE row-local expression over the FIXED bin
    * sequence (a Σ over bin ROWS would re-order floating adds), with
    * ε-smoothing so empty bins stay finite. Out-of-range values clamp
    * into the edge bins (no silent row loss). Output: one row per bin +
    * one '__psi' summary row — bounded by the bin count at any scale. */
  def psiReport(a: DataFrame, b: DataFrame, column: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo)
    val width = (hi - lo) / bins
    def binned(df: DataFrame, side: String) = {
      val idx = least(lit(bins - 1), greatest(lit(0),
        floor((col(column) - lit(lo)) / lit(width)).cast("int")))
      df.filter(col(column).isNotNull)
        .groupBy(idx.as("bin")).agg(count(lit(1)).as(side))
    }
    val base = binned(a, "n_a")
    val comp = binned(b, "n_b")
    val spark = a.sparkSession
    import spark.implicits._
    val grid = (0 until bins).map(i => (i, lo + i * width)).toDF("bin", "bin_lo")
    val cells = grid
      .join(base, Seq("bin"), "left").join(comp, Seq("bin"), "left")
      .select(col("bin"), col("bin_lo"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // one row carrying every bin in fixed order -> PSI in one expression
    val tot = cells.agg(
      sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"),
      array_sort(collect_list(struct(col("bin"), col("n_a"), col("n_b"))))
        .as("cs"))
    val eps = 1e-6
    val psi = tot.select(
      expr(s"""aggregate(cs, CAST(0.0 AS DOUBLE), (acc, c) ->
        acc + ((CAST(c.n_a AS DOUBLE) / CAST(ta AS DOUBLE) + $eps) -
               (CAST(c.n_b AS DOUBLE) / CAST(tb AS DOUBLE) + $eps)) *
              ln((CAST(c.n_a AS DOUBLE) / CAST(ta AS DOUBLE) + $eps) /
                 (CAST(c.n_b AS DOUBLE) / CAST(tb AS DOUBLE) + $eps)))""")
        .as("psi"))
      // ln is not correctly-rounded in either engine's libm — a few-ulp
      // slack between Java Math.log and C log is possible; 9 dp is far
      // below any decision threshold and far above the ulp noise
      .select(round(col("psi"), 9).as("psi"))
      .select(lit(-1).as("bin"), lit(null).cast("double").as("bin_lo"),
        lit(null).cast("long").as("n_a"), lit(null).cast("long").as("n_b"),
        col("psi"))
    cells.withColumn("psi", lit(null).cast("double"))
      .unionByName(psi)
      .orderBy(col("bin"))
  }

  /** PSI drift between two customer segments' balance distributions —
    * deterministic end to end (exact bin counts; PSI as one fixed-order
    * fold), so DuckDB mirrors it exactly with the same fold written as
    * a fixed arithmetic expression. */
  def qPsiDrift(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    psiReport(
      cust.filter(col("c_mktsegment") === "BUILDING"),
      cust.filter(col("c_mktsegment") === "MACHINERY"),
      "c_acctbal", -1000.0, 10000.0, 8)
  }

  def qPsiDriftSql: String = {
    val bins = 8; val lo = -1000.0; val hi = 10000.0
    val width = (hi - lo) / bins
    val eps = "1e-6"
    def cnt(side: String, i: Int) =
      s"""sum(CASE WHEN c_mktsegment = '$side' AND least(${bins - 1},
         | greatest(0, CAST(floor((c_acctbal - ($lo)) / $width) AS INT))) = $i
         | THEN 1 ELSE 0 END)""".stripMargin.replace("\n", " ")
    val cells = (0 until bins).map(i =>
      s"SELECT CAST($i AS INT) AS bin, CAST(${lo + i * width} AS DOUBLE) AS bin_lo, " +
        s"CAST(${cnt("BUILDING", i)} AS BIGINT) AS n_a, " +
        s"CAST(${cnt("MACHINERY", i)} AS BIGINT) AS n_b, " +
        "CAST(NULL AS DOUBLE) AS psi FROM customer"
    ).mkString("\nUNION ALL\n")
    val term = (i: Int) =>
      s"((CAST(b$i.n_a AS DOUBLE) / ta + $eps) - (CAST(b$i.n_b AS DOUBLE) / tb + $eps)) * " +
        s"ln((CAST(b$i.n_a AS DOUBLE) / ta + $eps) / (CAST(b$i.n_b AS DOUBLE) / tb + $eps))"
    val joins = (0 until bins).map(i => s"(SELECT n_a, n_b FROM cells WHERE bin = $i) b$i")
      .mkString(", ")
    // the fold accumulates left to right in bin order — written as the
    // same left-associated chain here
    val psiExpr = (1 until bins).foldLeft(s"(0.0 + ${term(0)})") {
      (acc, i) => s"($acc + ${term(i)})"
    }
    s"""WITH cells AS ($cells),
       |tots AS (SELECT CAST(sum(n_a) AS DOUBLE) AS ta,
       |                CAST(sum(n_b) AS DOUBLE) AS tb FROM cells)
       |SELECT bin, bin_lo, n_a, n_b, psi FROM cells
       |UNION ALL
       |SELECT CAST(-1 AS INT) AS bin, CAST(NULL AS DOUBLE) AS bin_lo,
       |  CAST(NULL AS BIGINT) AS n_a, CAST(NULL AS BIGINT) AS n_b,
       |  round(CAST($psiExpr AS DOUBLE), 9) AS psi
       |FROM tots, $joins""".stripMargin
  }

  // -------------------------------------------------------------- CUSUM

  /** CUSUM allowance (slack) and decision threshold, in 1e-4 value
    * units: alarm when the one-sided cumulative excess over
    * (user mean + 25.0) tops 400.0 — ~8σ of this corpus's per-event
    * noise, so alarms mark genuine sustained upward drifts, not tail
    * events (49 of 1500 sf0.1 users). */
  val CusumAllowScaled = 250000L
  val CusumThreshScaled = 4000000L

  /** CUSUM change-point detection over each user's value series — the
    * classic sequential drift detector (Page 1954; the DAQ shape:
    * "did this channel's baseline shift mid-run?"). The textbook
    * definition is a running recursion S_t = max(0, S_{t-1} + x_t − k),
    * which no plain window function expresses — but it has an EXACT
    * closed form over prefix sums,
    *   S_t = P_t − min(0, min_{j≤t} P_j),   P_t = Σ_{i≤t} (x_i − k),
    * so the whole detector is two cumulative window passes (sum, then
    * running min), embarrassingly parallel across users.
    *
    * Exactness discipline: x_i enters as DECIMAL(12,4)·10^4 BIGINT;
    * the reference level k = (user mean + allowance) would be a
    * rational, so every deviation is multiplied through by the user's
    * row count n — d_i = n·(x_i − A) − Σx — keeping P, the running min,
    * S, and the alarm comparison S > n·H exact end to end. The
    * deviations, prefix sums, and scores run in DECIMAL(38,0) on the
    * Spark side and HUGEINT in the oracle (the q_evt_lttb discipline,
    * r14): |P| ≤ 2·n²·max|x|·10^4 stays exact to n ≈ 7e14 events/user
    * at |x| ≤ 10^4 — a corpus-scale per-key history can no longer hit
    * the old BIGINT bound (n ≈ 2e4), and ANSI decimal overflow past
    * even that fails loudly, never wrongly. The one double in the
    * output is max_cusum = maxS / (n·10^4) — a single division of two
    * exactly-represented integers (gate-scale S < 2^53, so the
    * decimal/HUGEINT→double casts are exact in both engines),
    * IEEE-identical cross-engine.
    *
    * Scale: one shuffle partitioned by user_id shared by all four
    * window passes + the final per-user aggregate (partial-agg
    * combined); per-user frame state is O(1) for cumulative frames. */
  def qEvtCusum(s: SparkSession, d: String): DataFrame =
    cusumScores(Events.events(s, d))

  /** Core of [[qEvtCusum]] over any (event_id, user_id, ts, value)
    * frame — split out so the spec can plant a level-shifted series. */
  private[graft] def cusumScores(ev: DataFrame): DataFrame = {
    val peru = Window.partitionBy(col("user_id"))
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        (dec(col("value")) * 10000).cast("long").as("vi"))
      .withColumn("n", count(lit(1)).over(peru))
      // dev/p/s run in DECIMAL(38,0) (r14 — the widening the r13 bound
      // note documented): |P| ≤ 2·n²·max|x|·10^4 stays exact to
      // n ≈ 7e14 events/user at |x| ≤ 10^4 — no realistic per-key
      // history reaches it, and ANSI decimal overflow would still fail
      // loudly rather than wrongly. The product runs in decimal FROM the
      // n· multiply (a LONG n·(vi−A) already overflows near the old
      // bound).
      .withColumn("dev",
        col("n").cast("decimal(38,0)")
          * (col("vi") - lit(CusumAllowScaled))
          - sum(col("vi")).over(peru).cast("decimal(38,0)"))
      .withColumn("p", sum(col("dev")).over(cum).cast("decimal(38,0)"))
      .withColumn("s",
        col("p") - least(lit(0L).cast("decimal(38,0)"),
          min(col("p")).over(cum)))
      .withColumn("alarm", col("s") >
        col("n").cast("decimal(38,0)") * lit(CusumThreshScaled))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("alarm"), col("event_id"))).as("first_alarm_id"),
        (max(col("s")).cast("double") /
          (count(lit(1)) * 10000L).cast("double")).as("max_cusum"))
  }

  def qEvtCusumSql: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, ts,
       |    CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS BIGINT) AS vi
       |  FROM events WHERE value IS NOT NULL
       |), st AS (
       |  SELECT event_id, user_id, ts, vi,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
       |    CAST(sum(vi) OVER (PARTITION BY user_id) AS BIGINT) AS tot
       |  FROM e
       |), pp AS (
       |  SELECT *, sum(CAST(n AS HUGEINT) * (vi - $CusumAllowScaled)
       |      - tot) OVER w AS p
       |  FROM st WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), ss AS (
       |  SELECT *, p - least(CAST(0 AS HUGEINT), min(p) OVER w) AS s
       |  FROM pp WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(CASE WHEN s > n * $CusumThreshScaled THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_alarms,
       |  min(CASE WHEN s > n * $CusumThreshScaled THEN event_id END)
       |    AS first_alarm_id,
       |  CAST(max(s) AS DOUBLE) / CAST(count(*) * 10000 AS DOUBLE)
       |    AS max_cusum
       |FROM ss GROUP BY user_id""".stripMargin

  /** floor(1e6·log10(1 + 1/d)) for d = 1..9 — Benford's-law expected
    * first-digit shares as exact integer constants (hardcoded in BOTH
    * engine texts: math constants, not computed values, so no libm
    * composition can diverge). */
  val BenfordScaled: Seq[Long] = Seq(301029L, 176091L, 124938L, 96910L,
    79181L, 66946L, 57991L, 51152L, 45757L)

  /** BENFORD'S-LAW FIRST-DIGIT AUDIT (Newcomb 1881 / Benford 1938;
    * Nigrini's standard forensic data-quality screen — naturally
    * occurring magnitudes carry log-distributed leading digits, and a
    * flat or spiked profile flags synthetic, truncated, or tampered
    * feeds): per leading digit of |value|, the observed event count,
    * the Benford-expected count (n·log10(1+1/d), scaled 1e6), and the
    * absolute deviation — all exact integers. The digit extracts from
    * the exact BIGINT v4 = value·10⁴ via its decimal string (identical
    * digits in both engines for integers; never from a double's
    * engine-specific formatting). On THIS synthetic corpus the audit
    * correctly reports a strongly non-Benford profile — the report
    * flagging its input is the operator working.
    *
    * Scale shape: one scan, a 9-row map-side-combined aggregate, the
    * constants live in the plan. */
  def qEvtBenford(s: SparkSession, d: String): DataFrame = {
    val e = Events.events(s, d)
      .select((col("value").cast("decimal(12,4)") * 10000)
        .cast("long").as("v4"))
      .filter(col("v4") =!= 0)
      .select(substring(abs(col("v4")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val exp = BenfordScaled.zipWithIndex
      .map { case (l, i) => (i + 1, l) }
    import s.implicits._
    val expDf = exp.toDF("digit", "l_scaled")
    e.join(broadcast(expDf), "digit")
      .crossJoin(broadcast(e.agg(sum(col("n_obs")).as("n_total"))))
      .select(col("digit"), col("n_obs"), col("n_total"),
        (col("n_total") * col("l_scaled")).as("expected_scaled"),
        abs(col("n_obs") * lit(1000000L) -
          col("n_total") * col("l_scaled")).as("dev_scaled"),
        (col("n_obs").cast("double") / col("n_total").cast("double"))
          .as("observed_share"))
      .orderBy(col("digit"))
  }

  def qEvtBenfordSql: String = {
    val expRows = BenfordScaled.zipWithIndex
      .map { case (l, i) => s"(${i + 1}, ${l}::BIGINT)" }.mkString(", ")
    s"""WITH o AS (
       |  SELECT CAST(left(CAST(abs(v4) AS VARCHAR), 1) AS INT) AS digit,
       |    CAST(count(*) AS BIGINT) AS n_obs
       |  FROM (SELECT CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS BIGINT)
       |          AS v4 FROM events) x
       |  WHERE v4 <> 0
       |  GROUP BY 1
       |), exp(digit, l_scaled) AS (VALUES $expRows),
       |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM o)
       |SELECT digit, n_obs, n_total,
       |  n_total * l_scaled AS expected_scaled,
       |  abs(n_obs * 1000000 - n_total * l_scaled) AS dev_scaled,
       |  CAST(n_obs AS DOUBLE) / n_total AS observed_share
       |FROM o JOIN exp USING (digit) CROSS JOIN t
       |ORDER BY digit""".stripMargin
  }

  /** Minimum pair support for [[qAssocRules]] (transactions containing
    * both items). */
  val AssocMinSupport = 2L

  /** ASSOCIATION-RULE MINING (Agrawal & Srikant 1994 — the classic
    * market-basket support/confidence/lift report, here over the
    * co-purchase baskets of `lineitem`): itemsets of size 2 with
    * support ≥ [[AssocMinSupport]], scored by
    *   support = c(ab)/n, confidence(a→b) = c(ab)/c(a),
    *   lift = n·c(ab)/(c(a)·c(b)),
    * top-20 rules by lift. Like q_doc_rake, the scores are exact
    * integer floors of exact rationals — (1e6·…) DIV (…) with products
    * in DECIMAL(38,0)/HUGEINT — so NO float (not even libm) exists
    * anywhere and both engines agree bit-for-bit; ties break on the
    * item pair.
    *
    * Scale shape: distinct baskets materialize once and feed the item
    * counts and the pair self-join (the q_graph_triangles edge build —
    * per-order fan-out is basket-size-bounded); pair counts map-side
    * combine; the support filter cuts the relation before the two
    * vocabulary-bounded item joins; the final cut is a bounded
    * TakeOrdered. */
  def qAssocRules(s: SparkSession, d: String): DataFrame = {
    val b = s.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .localCheckpoint() // feeds n, the item counts, and both join sides
    val n = b.select(col("ok")).distinct().count()
    val items = b.groupBy(col("pk")).agg(count(lit(1)).as("ci"))
    val pairs = b.as("x").join(b.as("y"), "ok")
      .filter(col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= AssocMinSupport)
    pairs
      .join(items.select(col("pk").as("a"), col("ci").as("ca")), "a")
      .join(items.select(col("pk").as("b"), col("ci").as("cb")), "b")
      .select(col("a"), col("b"), col("cab").as("n_ab"),
        expr(s"CAST(CAST(1000000 AS DECIMAL(38,0)) * cab DIV $n AS BIGINT)")
          .as("support_scaled"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cab DIV ca AS BIGINT)")
          .as("confidence_scaled"),
        expr(s"CAST(CAST(1000000 AS DECIMAL(38,0)) * $n * cab" +
          " DIV (CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)")
          .as("lift_scaled"))
      .orderBy(col("lift_scaled").desc, col("a"), col("b"))
      .limit(20)
  }

  def qAssocRulesSql: String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), nt AS (
       |  SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM b
       |), items AS MATERIALIZED (
       |  SELECT pk, CAST(count(*) AS BIGINT) AS ci FROM b GROUP BY pk
       |), pairs AS (
       |  SELECT x.pk AS a, y.pk AS b, CAST(count(*) AS BIGINT) AS cab
       |  FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
       |  GROUP BY x.pk, y.pk
       |  HAVING count(*) >= $AssocMinSupport
       |)
       |SELECT a, b, cab AS n_ab,
       |  CAST(CAST(1000000 AS HUGEINT) * cab // n AS BIGINT)
       |    AS support_scaled,
       |  CAST(CAST(1000000 AS HUGEINT) * cab // ia.ci AS BIGINT)
       |    AS confidence_scaled,
       |  CAST(CAST(1000000 AS HUGEINT) * n * cab
       |    // (CAST(ia.ci AS HUGEINT) * ib.ci) AS BIGINT) AS lift_scaled
       |FROM pairs
       |JOIN items ia ON ia.pk = a
       |JOIN items ib ON ib.pk = b
       |CROSS JOIN nt
       |ORDER BY lift_scaled DESC, a, b LIMIT 20""".stripMargin
}
