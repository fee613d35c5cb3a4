package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan assertions: the scale posture (SURVEY.md §3) must be
  * visible in the plans Catalyst actually emits — pushdown reaching the
  * parquet scan, narrow read schemas, dims broadcast instead of shuffled,
  * top-K compiling to TakeOrderedAndProject, whole-stage codegen present.
  */
class PlanSpec extends GraftSpec {

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }
  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q2 filter + projection push into the parquet scan") {
    val p = formatted(Relational.q2FilterProject(spark, sf))
    assert(p.contains("PushedFilters:") &&
      (p.contains("LessThan(l_quantity") || p.contains("GreaterThan(l_discount")),
      s"filters not pushed:\n$p")
    // projection pruning: the scan must not read money/date columns
    assert(p.contains("l_orderkey") && !p.contains("l_extendedprice"),
      "read schema not pruned to the 3 projected columns")
  }

  test("q1 scan prunes to the 7 referenced lineitem columns") {
    val p = formatted(Relational.q1Agg(spark, sf))
    assert(!p.contains("l_orderkey") && !p.contains("l_suppkey"),
      "q1 scan reads join keys it never uses")
    assert(p.contains("PushedFilters:"), "shipdate filter not pushed")
  }

  test("q3/q5 broadcast the dimension side, never shuffle it") {
    val p3 = planString(Relational.q3JoinAgg(spark, sf))
    assert(p3.contains("BroadcastHashJoin"), s"q3 lost its broadcast join:\n$p3")
    val p5 = planString(Relational.q5MultiJoin(spark, sf))
    assert(p5.contains("BroadcastHashJoin"), "q5 dims not broadcast")
    assert(!p5.contains("CartesianProduct"), "q5 degenerated to a cartesian product")
  }

  test("top-K compiles to TakeOrderedAndProject (no global sort)") {
    val p = planString(Relational.qSortLimit(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"top-K plan:\n$p")
    assert(!p.replace("TakeOrderedAndProject", "").contains("Sort "),
      "top-K should not need a global Sort node")
  }

  test("semi/anti joins stay semi/anti at the physical level") {
    assert(planString(Relational.qSemiJoin(spark, sf)).contains("LeftSemi"))
    assert(planString(Relational.qAntiJoin(spark, sf)).contains("LeftAnti"))
  }

  test("aggregations use two-phase (partial) HashAggregate") {
    val p = planString(Relational.q1Agg(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected map-side partial + final aggregate")
  }

  test("hot-path queries stay inside whole-stage codegen") {
    Seq(Relational.q1Agg(spark, sf), Relational.q2FilterProject(spark, sf),
      Events.qEvtJson(spark, sf), TextOps.qDocQuality(spark, sf))
      .foreach { df =>
        df.collect() // finalize the adaptive plan so codegen spans materialize
        val p = planString(df)
        // codegen stages render as "*(n) Operator" in the finalized plan
        assert(p.contains("WholeStageCodegen") || p.contains("*("),
          s"no codegen span:\n${p.take(500)}")
      }
  }

  test("events geo enrichment broadcasts the readout map") {
    val p = planString(Events.qEvtGeoEnrich(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "readout map should broadcast")
  }

  test("minhash joins carry NO broadcast hint — corpus-sized sides must shuffle") {
    // Every join side in qDedupMinhash scales with the corpus (token arrays,
    // signature groups, representatives). A broadcast HINT would force an
    // OOM at 100 TB; without a hint AQE may still broadcast when a side is
    // genuinely small, which is the behavior we want. Hints survive analysis
    // as ResolvedHint nodes — assert none exist anywhere in the plan.
    val analyzed = Dedup.qDedupMinhash(spark, sf).queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"corpus-sized side carries a broadcast hint:\n${analyzed.take(2000)}")
    val simhash = Dedup.qDedupSimhash(spark, sf).queryExecution.analyzed.toString
    assert(!simhash.contains("ResolvedHint"), "simhash side carries a broadcast hint")
  }

  test("tfidf has no broadcast hint and no driver-side count at plan build") {
    val analyzed = TextOps.qDocTfidf(spark, sf).queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      "vocabulary-sized DF side carries a broadcast hint")
  }

  test("ann_lsh candidates come from a band-key semi-join, not a full scan") {
    val opt = Similarity.qAnnLsh(spark, sf).queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftSemi"),
      s"LSH bucket lookup should be a semi-join on (tbl, sig):\n${opt.take(2000)}")
    assert(opt.toLowerCase.contains("posexplode"),
      "band keys should be generated via posexplode")
  }

  test("ann_ivf prunes inverted-list partitions via dynamic partition pruning") {
    // the 100 TB contract: a probe physically reads ~nProbe of k partitions
    // of the list_id-partitioned assignments table, enforced by DPP from
    // the broadcast top-lists side — not a full scan + post-filter
    val q = Similarity.qAnnIvf(spark, sf)
    q.write.format("noop").mode("overwrite").save() // build index + finalize AQE plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"assignments scan must carry a DPP partition filter:\n${plan.take(2000)}")
  }

  test("q19 disjunctive predicate splits and pushes to BOTH scans (CNF)") {
    // the OR-of-ANDs references both tables in every conjunct; Catalyst's
    // CNF conversion must still derive a part-only disjunction for the
    // part scan and a quantity-band disjunction for the lineitem scan
    // assert on the OPTIMIZED LOGICAL plan: the physical plan is wrapped by
    // AQE (collect can't reach scans) and its string form truncates long
    // filter lists — both made physical assertions suite-order-flaky. The
    // CNF-derived per-table filters already sit below the join here.
    val opt = Relational.q19Disjunctive(spark, sf).queryExecution.optimizedPlan
    val filters = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        (f.condition.references.map(_.name).toSet, f.condition.toString)
    }
    assert(filters.exists { case (refs, c) =>
      refs.forall(_.startsWith("p_")) && c.contains("Brand#12") },
      s"expected a part-only CNF filter with the brand disjunction: $filters")
    assert(filters.exists { case (refs, c) =>
      refs.forall(_.startsWith("l_")) && refs.contains("l_quantity") },
      s"expected a lineitem-only CNF filter with the quantity bands: $filters")
  }

  test("deadtime detection has no window and aggregates two-phase") {
    // the scale claim: distinct present-minutes + generated minute dim,
    // never a single-partition lag/window over the raw event stream
    val plan = graft.operators.Events.qEvtDeadtime(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window operator expected:\n${plan.take(1500)}")
    assert(plan.contains("HashAggregate"), "two-phase aggregation expected")
    assert(plan.toLowerCase.contains("leftanti"), "minute-dim anti-join expected")
  }

  test("q18/q21 decorrelate to aggregates — no correlated joins, deterministic top-K") {
    // Q18: the IN-subquery must become a semi-join on the per-order agg
    val p18 = planString(Relational2.q18BigOrders(spark, sf))
    assert(p18.contains("LeftSemi"), s"Q18 lost its semi-join:\n${p18.take(1500)}")
    assert(!p18.contains("CartesianProduct"))
    // Q21: the EXISTS/NOT-EXISTS pair must be ONE per-order aggregate —
    // never a correlated per-row subquery or a cartesian self-join
    val q21 = Relational2.q21Waiting(spark, sf)
    val p21 = planString(q21)
    assert(!p21.contains("CartesianProduct"), "Q21 degenerated to a cartesian")
    assert(p21.contains("TakeOrderedAndProject"),
      "Q21 top-100 should compile to TakeOrderedAndProject")
    val analyzed = q21.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), "Q21 sides must stay hint-free")
  }

  test("q20/q22: window over the aggregated frame; anti-join with pushed date filter") {
    // Q20: the per-part total must be a window over the per-(part, supplier)
    // AGGREGATE — never over raw lineitem — so lineitem is scanned once
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val opt20 = Relational2.q20DominantSupp(spark, sf).queryExecution.optimizedPlan
    val win = opt20.collect { case w: LWindow => w }
    assert(win.nonEmpty, "Q20 lost its window")
    assert(win.head.collect { case a: Aggregate => a }.nonEmpty,
      "Q20's window must sit over the per-(part, supplier) aggregate")
    // the RANGE predicate itself must reach the scan — IsNotNull alone is
    // auto-derived and would make this check vacuous
    val f20 = formatted(Relational2.q20DominantSupp(spark, sf))
    assert(f20.contains("GreaterThanOrEqual(l_shipdate"),
      s"Q20 ship-date window not pushed to the lineitem scan:\n${f20.take(1500)}")
    // Q22: NOT EXISTS must be a left-anti join, with the last-year filter
    // pushed to the orders scan so the anti side shuffles only recent keys
    val f22 = formatted(Relational2.q22Lapsed(spark, sf))
    assert(f22.contains("LeftAnti"), s"Q22 lost its anti-join:\n${f22.take(1500)}")
    assert(f22.contains("GreaterThanOrEqual(o_orderdate"),
      s"Q22 order-date filter not pushed to the orders scan:\n${f22.take(1500)}")
  }

  test("q13/q15: fact pre-aggregated below the outer join; revenue exchange reused") {
    // Q13: the orders fact must fold to per-custkey counts BELOW the outer
    // join — the join may only ever carry one row per customer
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    val opt13 = Relational2.q13CustDist(spark, sf).queryExecution.optimizedPlan
    val outer = opt13.collect { case j: Join if j.joinType == LeftOuter => j }
    assert(outer.nonEmpty, "Q13 lost its outer join")
    assert(outer.head.right.collect { case a: Aggregate => a }.nonEmpty,
      "Q13's orders side must pre-aggregate below the outer join")
    // Q15: the revenue view feeds both the scalar max and the winner
    // filter via one identical suppkey exchange on each side — AQE dedups
    // it AT RUNTIME (ReusedExchange only appears in the final adaptive
    // plan), so execute first, then assert the reuse actually happened
    val df15 = Relational2.q15TopSupplier(spark, sf)
    df15.collect()
    val p15 = planString(df15)
    assert(p15.contains("isFinalPlan=true"))
    assert(p15.contains("ReusedExchange"),
      s"Q15 revenue exchange not reused at runtime:\n${p15.take(2000)}")
  }

  test("runtime Bloom-filter pruning injects on a selective shuffle join") {
    // At cluster scale a selective dim filter turns into a runtime Bloom
    // filter on the fact side of a shuffle join (Spark's InjectRuntimeFilter
    // — row-level runtime pruning where DPP needs partition columns). The
    // default thresholds (10 GB application-side scan) are cluster-sized,
    // so PROVE the machinery in a child session with thresholds floored;
    // production configs stay at the scale-tuned defaults.
    import org.apache.spark.sql.functions.{col, count, lit}
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
    s2.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    val li = Tables.lineitem(s2, sf)
    val part = Tables.part(s2, sf).filter(col("p_brand") === "Brand#23")
    val joined = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
    val opt = joined.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      s"no runtime bloom filter injected:\n${opt.take(1500)}")
    // and it still computes the right answer with the filter in place
    val n = joined.collect().map(_.getAs[Long]("n")).sum
    val expected = li.join(part.hint("broadcast"),
      col("l_partkey") === col("p_partkey")).count()
    assert(n == expected, "bloom-filtered join changed the result")
  }

  test("wib coherent computes the common mode in-row — no window over the sample stream") {
    // all of a tick's samples live in one decoded frame row, so the per-tick
    // sum must come from a higher-order function over the samples array, not
    // a (frame, tick) window that would shuffle the full sample stream
    val plan = Wib.qWibCoherent(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"common mode must be computed in-row, not via a window:\n${plan.take(1500)}")
    assert(plan.contains("HashAggregate"), "two-phase per-channel aggregation expected")
  }

  test("q17 per-part aggregate is scoped to the brand's partkeys") {
    // decorrelation scope = needed keys only: the Aggregate grouping on
    // l_partkey must sit ABOVE the brand semi-join, never over all parts
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val opt = Relational.q17SmallQty(spark, sf).queryExecution.optimizedPlan
    val scoped = opt.collect {
      case a: Aggregate
          if a.groupingExpressions.exists(_.references.exists(_.name == "l_partkey")) =>
        a.exists { case j: Join => j.joinType.sql == "LEFT SEMI"; case _ => false }
    }
    assert(scoped.nonEmpty, "expected a per-part Aggregate in the optimized plan")
    assert(scoped.forall(identity),
      s"per-part aggregate input must carry the brand partkey semi-join:\n${opt.toString.take(2000)}")
  }

  test("q7/q10/q14/q16: filters reach the scans; q10 top-20 is TakeOrderedAndProject") {
    // Q10: returnflag pushes to the lineitem scan, the quarter to orders,
    // and the top-20 must not need a global sort
    val f10 = formatted(Relational3.q10ReturnedItems(spark, sf))
    assert(f10.contains("EqualTo(l_returnflag,R)"),
      s"Q10 returnflag not pushed:\n${f10.take(1200)}")
    assert(f10.contains("GreaterThanOrEqual(o_orderdate"),
      s"Q10 order-date window not pushed:\n${f10.take(1200)}")
    assert(f10.contains("TakeOrderedAndProject"), "Q10 top-20 needs no global sort")
    // Q14: the ship-month window pushes to the lineitem scan
    val f14 = formatted(Relational3.q14PromoShare(spark, sf))
    assert(f14.contains("GreaterThanOrEqual(l_shipdate"),
      s"Q14 ship-month not pushed:\n${f14.take(1200)}")
    // Q16: part attribute filters push to the part scan; the distinct
    // pair relation and the count-distinct both aggregate two-phase
    val f16 = formatted(Relational3.q16SupplierCnt(spark, sf))
    assert(f16.contains("In(p_size"), s"Q16 size filter not pushed:\n${f16.take(1200)}")
    val p16 = planString(Relational3.q16SupplierCnt(spark, sf))
    assert("HashAggregate".r.findAllIn(p16).size >= 2, "Q16 expects partial aggregates")
    // Q7: the two-year ship window pushes to the lineitem scan
    val f7 = formatted(Relational3.q7VolumeShipping(spark, sf))
    assert(f7.contains("GreaterThanOrEqual(l_shipdate"),
      s"Q7 ship window not pushed:\n${f7.take(1200)}")
  }

  test("quantized IVF scores on the persisted int8 codes — codes ReadSchema, vec untouched, DPP holds") {
    val q = Similarity.qAnnIvfQuant(spark, sf)
    q.write.format("noop").mode("overwrite").save() // build index + finalize AQE
    val plan = q.queryExecution.executedPlan.toString
    // probed lists still prune at the directory level
    assert(plan.contains("dynamicpruningexpression"),
      s"assignments scan lost its DPP partition filter:\n${plan.take(2000)}")
    // the scoring scan reads the CODE column from the index — the persisted
    // 4x-smaller representation, not recomputed from full precision
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    val idxScans = scans.filter(_.contains("assignments"))
    assert(idxScans.nonEmpty, s"no assignments scan found:\n${scans.mkString("\n")}")
    assert(idxScans.exists(_.contains("codes")),
      s"assignments scan must read the codes column:\n${idxScans.mkString("\n")}")
    // and none of the index scans read anything full-precision (the
    // source table's float array is `embedding`; the index stores none)
    assert(!idxScans.exists(_.contains("embedding")),
      s"index scan must never touch full-precision vectors:\n${idxScans.mkString("\n")}")
    // while qAnnIvf (ids only) PRUNES the codes it doesn't ask for
    val q2 = Similarity.qAnnIvf(spark, sf)
    q2.write.format("noop").mode("overwrite").save()
    val scans2 = q2.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("FileScan") && l.contains("assignments")).toSeq
    assert(scans2.nonEmpty && !scans2.exists(_.contains("codes")),
      s"qAnnIvf must column-prune the codes it doesn't use:\n${scans2.mkString("\n")}")
    // and the BATCHED quantized probe keeps both properties: DPP over the
    // union of probe lists + a codes-only index scan
    val q3 = Similarity.qAnnIvfQuantBatch(spark, sf)
    q3.write.format("noop").mode("overwrite").save()
    val plan3 = q3.queryExecution.executedPlan.toString
    assert(plan3.contains("dynamicpruningexpression"),
      "batched quantized scan lost its DPP partition filter")
    val scans3 = plan3.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("assignments")).toSeq
    assert(scans3.exists(_.contains("codes")) && !scans3.exists(_.contains("embedding")),
      s"batched quantized index scan must read codes only:\n${scans3.mkString("\n")}")
  }

  test("batched ann_ivf keeps dynamic partition pruning over the union of probe lists") {
    // the batched contract: B probes = ONE assignments scan reading at most
    // the UNION of their nProbe lists (DPP from the broadcast probe→list
    // map), never B scans and never the full table
    val q = Similarity.qAnnIvfBatch(spark, sf)
    q.write.format("noop").mode("overwrite").save()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"batched assignments scan must carry a DPP partition filter:\n${plan.take(2000)}")
  }

  test("split/mix never read the text column; one exchange; no joins") {
    // the sampling contract: assignment is a narrow projection fused into
    // the scan — the only exchange is the bounded final aggregate, and the
    // mixture policy resolves as a CASE, never a join
    for (df <- Seq(Sampling.qDocSplit(spark, sf), Sampling.qDocMix(spark, sf))) {
      val f = formatted(df)
      assert(!f.contains("text"), s"sampling scan must not read text:\n$f")
      val p = planString(df)
      assert("Exchange".r.findAllIn(p).size == 1,
        s"expected exactly the final-aggregate exchange:\n$p")
      assert(!p.contains("Join"), s"policy must fold to a CASE, not a join:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        "sampling census must aggregate two-phase")
    }
  }

  test("source-overlap reads only (text, source) and stays decisions-shaped") {
    val df = Dedup.qSourceOverlap(spark, sf)
    val f = formatted(df)
    assert(!f.contains("doc_id") && !f.contains("n_chars"),
      s"overlap scan must read only text+source:\n$f")
    val p = planString(df)
    assert(!p.contains("Join"),
      s"overlap must never self-join documents:\n$p")
  }

  test("q2/q11: window over the aggregated pair frame; exact integer share test; top-100 bounded") {
    // q2: the correlated min-cost subquery must decorrelate to ONE pair
    // aggregate with the window above it, and the deterministic top-100
    // must compile to TakeOrderedAndProject (no global sort)
    val p2 = planString(Relational3.q2MincostSupp(spark, sf))
    assert(p2.contains("TakeOrderedAndProject"),
      s"q2 top-100 must be TakeOrderedAndProject:\n${p2.take(800)}")
    assert("HashAggregate".r.findAllIn(p2).size >= 2,
      "pair-cost aggregate must be two-phase")
    val winIdx = p2.indexOf("Window")
    val aggIdx = p2.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      "the window must sit ABOVE the pair aggregate (aggregated frame only)")
    // q11: the share HAVING must be the exact integer multiplication,
    // never a divided average
    val p11 = planString(Relational3.q11TopShare(spark, sf))
    assert(p11.contains("val4") && p11.contains("nparts")
      && p11.contains("tot4"),
      s"q11 share test must compare val4*nparts vs tot4*2:\n${p11.take(1200)}")
    assert(!p11.replace("/ 1e4", "").replace("/ 10000.0", "")
      .contains("divide"), "no division inside the share predicate")
  }

  test("batched ANN candidate cuts run the two-phase bounded heap, not corpus windows") {
    // every batched path's data-scaled score relation must be cut by a
    // PARTIAL TopKPerGroup (map-side bounded heap — ≤ groups·K rows per
    // scan partition reach the exchange), never funneled into per-probe
    // single-task row_number window sorts; remaining Window nodes may only
    // rank BOUNDED inputs (probe lists k×B, final ≤ B·K candidates)
    val batched = Seq(
      "ann_batch" -> Similarity.qAnnBatch(spark, sf),
      "ann_ivf_batch" -> Similarity.qAnnIvfBatch(spark, sf),
      "ann_lsh_batch" -> Similarity.qAnnLshBatch(spark, sf),
      "ann_ivf_quant_batch" -> Similarity.qAnnIvfQuantBatch(spark, sf),
      "ann_pq_batch" -> Pq.qAnnPqBatch(spark, sf))
    for ((name, df) <- batched) {
      val p = planString(df)
      assert(p.contains(", true"), // the partial exec prints `…, true`
        s"$name must cut candidates with a partial TopKPerGroup:\n${p.take(1200)}")
      assert(p.contains("TopKPerGroup"),
        s"$name missing the bounded-heap cut:\n${p.take(1200)}")
    }
  }

  test("asofJoin plans as ONE key exchange + window — no join operator, " +
      "no range explosion") {
    import graft.operators.{Events, Joins}
    import org.apache.spark.sql.functions.{col, max}
    val ev = Events.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max(col("event_id")).as("view_id"))
    val plan = planString(
      Joins.asofJoin(p, v, Seq("user_id"), "ts", "view_ts"))
    // the union-window shape: a Window over the tagged union — the whole
    // point is that NO physical join touches the two sides
    assert(plan.contains("Window"), plan.take(400))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("BroadcastNestedLoopJoin"),
      "asofJoin must not plan a physical join")
    // exchanges: v's pre-aggregate shuffles once on (user_id, ts), the
    // union window once on user_id — nothing else
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx <= 2, s"expected <=2 hash exchanges, got $nEx\n$plan")
  }

  test("q_stat_moments is one two-phase aggregate pass — no Expand, one " +
      "exchange, power sums inside") {
    val plan = planString(graft.operators.Relational3.qStatMoments(spark, sf))
    assert(plan.contains("HashAggregate"), plan.take(300))
    assert(!plan.contains("Expand"),
      "moments must not plan a distinct-style Expand")
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx == 1, s"expected exactly 1 exchange, got $nEx")
    assert(plan.contains("partial_"), "map-side partial aggregation missing")
  }

  test("q_evt_m4 is one sortless map-side-combined aggregate — no Window, " +
      "no Sort, one exchange") {
    val plan = planString(graft.operators.Analytics.qEvtM4(spark, sf))
    assert(!plan.contains("Window"),
      s"m4 must not plan a window (per-cell sorts scale with data):\n$plan")
    assert(!plan.contains("Sort "), s"m4 must not sort:\n$plan")
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx == 1, s"expected exactly 1 exchange, got $nEx\n$plan")
    assert(plan.contains("partial_"), "map-side partial aggregation missing")
  }

  test("q12_late_lines pushes the ship-year window to the lineitem scan " +
      "and folds both CASE-sums in one map-side-combined aggregate") {
    val p = formatted(graft.operators.Relational3.q12LateLines(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"ship window not pushed:\n${p.take(800)}")
    val plan = planString(graft.operators.Relational3.q12LateLines(spark, sf))
    assert(plan.contains("partial_sum"), "CASE-sums not map-side combined")
    assert(!plan.contains("Expand"), "q12 must not plan an Expand")
  }

  test("q_fk_check scans lineitem exactly once (chained-edge audit)") {
    val plan = planString(graft.operators.Analytics.qFkCheck(spark, sf))
    // the fact table must back exactly ONE FileScan (its 3 edges chain off
    // one pass); parent DIM key-set scans may repeat across edges — tiny
    val nLi = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(nLi == 1, s"lineitem scanned $nLi times — edges must chain:\n$plan")
  }

  test("cusum shares ONE user_id exchange across all three window passes " +
      "and the two-phase per-user aggregate") {
    val plan = planString(graft.operators.Analytics.qEvtCusum(spark, sf))
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected exactly one exchange:\n$plan")
    assert(plan.contains("partial_count"), "funnel agg must be two-phase")
    assert("Window\\b".r.findAllIn(plan).length >= 3,
      "all window passes must sit on the shared partitioning")
  }

  test("dsir scoring joins the model by SIZE-DRIVEN broadcast (no hint in " +
      "source) with a two-phase per-doc aggregate") {
    val plan = planString(graft.operators.Sampling.qDocDsir(spark, sf))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildRight"),
      s"the V-row model must broadcast:\n$plan")
    // r14: the per-doc agg folds sum(c) over per-(doc,feature) counts
    assert(plan.contains("partial_sum"), "per-doc agg must be two-phase")
  }

  test("cascade runs in one scan: a single md5 window exchange plus the " +
      "two-phase funnel aggregate — no self-joins") {
    val plan = planString(graft.operators.TextOps.qDocCascade(spark, sf))
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx == 2, s"window + funnel agg = two exchanges, got $nEx:\n$plan")
    assert("Window\\b".r.findAllIn(plan).length == 1, "one md5 window")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "the rep-collapse must be a window, never a join")
    val nDoc = "documents\\.parquet".r.findAllIn(plan).length
    assert(nDoc == 1, s"documents scanned $nDoc times — must be one pass")
  }

  test("gopher/badwords/unimax/temperature fold in ONE documents scan " +
      "with no joins on the corpus path") {
    for ((name, q) <- Seq[(String, DataFrame)](
      "gopher" -> graft.operators.TextOps.qDocGopher(spark, sf),
      "badwords" -> graft.operators.TextOps.qDocBadwords(spark, sf),
      "unimax" -> graft.operators.Sampling.qDocUnimax(spark, sf),
      "temperature" -> graft.operators.Sampling.qDocTemperature(spark, sf))) {
      val plan = planString(q)
      val nDoc = "documents\\.parquet".r.findAllIn(plan).length
      assert(nDoc == 1, s"$name: documents scanned $nDoc times:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name: no corpus-sized join belongs here")
    }
  }

  test("perplexity scores off the ONE materialized count frame — no " +
      "documents re-scan after the fold (the DSIR single-pass rule)") {
    val plan = planString(
      graft.operators.TextOps.qDocPerplexity(spark, sf))
    val nDoc = "documents\\.parquet".r.findAllIn(plan).length
    assert(nDoc == 0, // the count frame is a localCheckpoint: scan-free
      s"scoring must read the checkpointed counts, got $nDoc scans:\n$plan")
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      "the materialized count frame must feed the plan")
  }

  test("fano aggregates minute counts map-side: two exchanges, no joins, " +
      "no minute dimension generated") {
    val df = graft.operators.Events.qEvtFano(spark, sf)
    val plan = planString(df)
    assert(!plan.contains("Join"), s"fano must not join:\n$plan")
    assert(!plan.toLowerCase.contains("generate"),
      "no explode/sequence — empty minutes are implicit")
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx <= 2, s"fano needs at most two narrow exchanges, saw $nEx")
  }

  test("readability is one narrow per-doc projection: zero exchanges, " +
      "no joins, ReadSchema carries only doc_id + text") {
    val df = graft.operators.TextOps.qDocReadability(spark, sf)
    val plan = planString(df)
    assert(!plan.contains("Exchange"), s"readability must not shuffle:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!plan.contains("Join"), "readability must not join")
    assert(!plan.contains("lang") && !plan.contains("source"),
      "column pruning must drop unprojected document columns")
  }

  test("rename-epoch scan: a filter on the renamed column pushes into " +
      "BOTH branches, bearing each epoch's physical name") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_plan_ren").toString
    val t = graft.sources.GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    spark.read.parquet(s"$sf/customer.parquet")
      .repartition(2).write.parquet(s"$tmp/landing")
    t.ingest(s"$tmp/landing")
    t.renameColumn("c_acctbal", "balance")
    // one post-rename write so both epochs hold files
    t.update(org.apache.spark.sql.functions.col("c_custkey") === 1L,
      Seq("balance" -> org.apache.spark.sql.functions.lit(1.0)))
    val q = t.read().filter(org.apache.spark.sql.functions.col("balance") > 0)
      .select(org.apache.spark.sql.functions.col("c_custkey"))
    val plan = planString(q)
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("GreaterThan(c_acctbal")),
      s"old epoch must receive the OLD physical name:\n${pushed.mkString("\n")}")
    assert(pushed.exists(_.contains("GreaterThan(balance")),
      s"new epoch must receive the NEW physical name:\n${pushed.mkString("\n")}")
  }

  test("widen-epoch scan: an integral filter on the widened column " +
      "pushes into BOTH branches through the up-cast (UnwrapCast), " +
      "bearing each epoch's physical type") {
    import org.apache.spark.sql.functions.{col, lit}
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_plan_wid").toString
    graft.sources.GraftSql.sql(spark,
      s"CREATE TABLE plan_wid (k INT, v STRING) LOCATION '$tmp/t'")
    graft.sources.GraftSql.sql(spark,
      "INSERT INTO plan_wid VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    graft.sources.GraftSql.sql(spark,
      "ALTER TABLE plan_wid ALTER COLUMN k TYPE BIGINT")
    graft.sources.GraftSql.sql(spark,
      "INSERT INTO plan_wid VALUES (3000000000, 'big')")
    val t = graft.sources.GraftTable(spark, s"$tmp/t/ledger", s"$tmp/t/gen")
    val q = t.read().filter(col("k") >= lit(2L)).select(col("v"))
    val plan = planString(q)
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).toSeq
    // the pre-widen branch scans k as INT: the bigint comparison must
    // unwrap through the cast and reach the parquet scan as an int
    // bound; the post-widen branch pushes the long bound directly
    assert(pushed.count(_.contains("GreaterThanOrEqual(k")) >= 2,
      s"both epoch branches must push the k filter:\n${
        pushed.mkString("\n")}\nFULL:\n${plan.take(3000)}")
    graft.sources.GraftSql.unbind(spark, "plan_wid")
  }

  test("periodicity shares ONE user_id exchange across the stats window " +
      "and all eight leads") {
    val df = graft.operators.Events.qEvtPeriodicity(spark, sf)
    val plan = planString(df)
    val nEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(nEx == 1, s"expected ONE user_id exchange, saw $nEx:\n${
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n")}")
  }

  test("kldiv joins the token relation hint-free and broadcasts the " +
      "bounded totals; one corpus-scaled count exchange") {
    val df = graft.operators.TextOps.qDocKldiv(spark, sf)
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    val plan = planString(df)
    // the source-totals and the 1-row N frame ride broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2
      || plan.contains("BroadcastNestedLoopJoin"),
      s"bounded relations must broadcast:\n${plan.take(800)}")
    // the (source, tok) count frame is checkpointed once — the plan
    // reads the materialized RDD, never re-scanning documents
    assert(!plan.contains("documents.parquet"),
      "the count frame must feed all three uses (no re-scan)")
  }

  test("range search scores all probes in one scan: no shuffle below " +
      "the per-probe aggregate, probes broadcast") {
    val df = graft.operators.Similarity.qAnnRange(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val plan = planString(df)
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"),
      s"the probe batch must broadcast:\n${plan.take(600)}")
    // matches never shuffle raw: the only hash exchanges carry the
    // #probes-row aggregate and the final left join
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx <= 3, s"range search must not shuffle scored rows, saw $nEx")
  }

  test("mad medians select over distinct-value count relations — the " +
      "windows sit above aggregates, never over raw events") {
    val df = graft.operators.Events.qEvtMad(spark, sf)
    val plan = planString(df)
    // every Window input must be an aggregated (partial_count/sum) frame:
    // the raw per-event relation never reaches a window operator
    assert("Window\\b".r.findAllIn(plan).nonEmpty, "selection windows exist")
    // the distinct-value count frame is checkpointed — the final plan
    // reads the materialized counts; events scanned exactly once, at
    // checkpoint time (0 scans here = the single-pass property)
    val nEvt = "events\\.parquet".r.findAllIn(plan).length
    assert(nEvt == 0, s"events re-scanned $nEvt times after the fold:\n$plan")
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      "the materialized count frame must feed the plan")
  }
}