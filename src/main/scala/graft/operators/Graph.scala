package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-native graph primitives. */
object Graph {

  /** Connected components of an UNDIRECTED graph given as an edge list —
    * the general-graph upgrade of Dedup.dupClusters' forest-only pointer
    * jumping. Output: (node, cluster_id) for every node appearing in an
    * edge, cluster_id = the component's min node id. Deterministic.
    *
    * Algorithm — single-loop accelerated min-label propagation. Per round,
    * each node's label becomes the min of
    *   (a) its own label,
    *   (b) its neighbors' labels (propagation along edges), and
    *   (c) its label's label (pointer jumping — label-chasing squares the
    *       distance a min travels, turning O(diameter) rounds into
    *       O(log diameter) on chains),
    * iterated until no label changes. At the fixpoint every edge (u,v) has
    * label(u) = label(v) (each ≤ the other), so a component is uniformly
    * labeled; labels never drop below the component min and the min node
    * keeps its own id, so the shared label IS the component min.
    *
    * Scale/job shape (the round-2 rewrite lesson — the previous nested
    * contraction/pointer-jump version launched 120 jobs and hit geometric
    * per-round blowup): exactly ONE materialization barrier per round
    * (localCheckpoint of the new label frame) plus ONE convergence count on
    * that already-materialized frame — 2 jobs/round, ~4-6 rounds for
    * near-dup graphs. All joins are shuffle equi-joins on node ids; every
    * frame is O(nodes); nothing driver-side. GraphSpec/SetSimSpec assert a
    * job budget so a job-storm regression cannot ship silently.
    */
  def connectedComponents(edges0: DataFrame, src: String, dst: String): DataFrame = {
    val caller = edges0.sparkSession
    // The loop runs on a DEDICATED child session (same SparkContext, cluster
    // and cache; own SQLConf): AQE off + graph-scaled shuffle width are loop
    // requirements, and setting them on the caller's session would leak to
    // concurrent queries. The edge plan moves onto the child via GraftShim
    // (plans are session-agnostic; only conf resolution differs), and the
    // result moves back so callers never see a foreign-session frame.
    val spark = caller.newSession()
    val partsWas = caller.conf.get("spark.sql.shuffle.partitions")
    // AQE off for the loop: the loop's frames are node-scaled and
    // re-materialized every round — AQE's per-stage re-plan turns each
    // round's ONE materialization into ~8 separate jobs (one per exchange)
    // for zero benefit on frames this shape, and the iterative driver loop
    // wants deterministic, flat job accounting (2 jobs/round).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import org.apache.spark.sql.GraftShim
    val e = GraftShim.ofRows(spark, GraftShim.logicalPlan(edges0))
      .select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
        .filter(col("a") =!= col("b"))
      val und0 = e.union(e.select(col("b").as("a"), col("a").as("b")))
        .distinct()
        .localCheckpoint()
      // AQE is off in the loop, so size the fixed shuffle width to the graph
      // (~1M edge-rows per partition, capped at the session conf): a tiny
      // near-dup graph runs 1-2 partitions/round instead of paying
      // session-width task overhead 2x per round; a billion-edge graph
      // keeps the session's width.
      val undRows = und0.count()
      // ~100k rows/partition (r17, was 1M) — the labelPropagation rule:
      // per-round work is a join + two aggregates over every undirected
      // row; 1M-row partitions under-parallelize dense graphs
      val loopParts = math.max(1L,
        math.min(partsWas.toLong, undRows / 100000L + 1L))
      spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
      // Pre-partition AND pre-sort the edge relation by the join key ONCE:
      // localCheckpoint preserves outputPartitioning/outputOrdering, so
      // every round's edges⋈labels sort-merge join reuses them — the large
      // side of the per-round join never exchanges or re-sorts again (at
      // scale edges >> labels; this is the loop's dominant data volume).
      val und = und0
        .repartition(loopParts.toInt, col("b"))
        .sortWithinPartitions(col("b"))
        .localCheckpoint()
      // init labels lazily off the checkpointed und — round 1's barrier
      // bakes it in; no separate materialization job
      var labels = und.select(col("a").as("node"))
        .distinct()
        .withColumn("label", col("node"))

      var changed = 1L
      var round = 0
      while (changed > 0 && round < 64) { // 64 = safety net, not the driver
        // (b) min label over neighbors
        val nbrMin = und
          .join(labels.select(col("node").as("b"), col("label").as("nl")), "b")
          .groupBy(col("a")).agg(min(col("nl")).as("nbr_min"))
          .select(col("a").as("node"), col("nbr_min"))
        val stepped = labels.select(col("node"), col("label").as("old"))
          .join(nbrMin, Seq("node"), "left")
          .withColumn("l1", least(col("old"), coalesce(col("nbr_min"), col("old"))))
        // (c) pointer jump: chase l1 through the previous label map
        val lmap = labels.select(col("node").as("m_node"), col("label").as("m_label"))
        val next = stepped
          .join(lmap, stepped("l1") === lmap("m_node"), "left")
          .select(col("node"), col("old"),
            least(col("l1"), coalesce(col("m_label"), col("l1"))).as("label"))
          .localCheckpoint() // the round's single materialization barrier
        changed = next.filter(col("label") < col("old")).count() // labels only decrease
        labels = next.select(col("node"), col("label")) // flat select over checkpoint
        round += 1
      }
      // the 64-round cap is a safety net, not an answer: partially-propagated
      // labels are WRONG cluster ids, so non-convergence must fail loudly
      if (changed > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $round rounds " +
            s"($changed labels still changing) — refusing to return partial labels")
      GraftShim.ofRows(caller,
        GraftShim.logicalPlan(labels.select(col("node"), col("label").as("cluster_id"))))
  }

  /** PAGERANK over a directed edge list — the link-centrality score a
    * crawl-curation pipeline uses to pick canonical pages and weight
    * sources (and, over a near-dup SIMILARITY graph, to pick the most
    * central representative of each duplicate cluster). Fixed iteration
    * count + damping (deterministic given the graph); dangling mass
    * redistributes uniformly per round (rank sums to n every round —
    * spec-conserved). Loop discipline identical to
    * [[connectedComponents]] (the round-2 lesson): dedicated child
    * session, AQE OFF inside the loop, graph-scaled shuffle width,
    * edges pre-partitioned+sorted ONCE on the join key, exactly ONE
    * localCheckpoint barrier per round plus one scalar job (the
    * dangling-mass sum — the convergence-count analog). Returns
    * (node, rank); ranks are floats whose summation order is
    * engine-specific → [rows]/spec, never oracle-hashed. */
  def pageRank(edges0: DataFrame, src: String, dst: String,
      iterations: Int = 8, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1)
    val caller = edges0.sparkSession
    val spark = caller.newSession()
    val partsWas = caller.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import org.apache.spark.sql.GraftShim
    val e0 = GraftShim.ofRows(spark, GraftShim.logicalPlan(edges0))
      .select(col(src).cast("long").as("s"), col(dst).cast("long").as("t"))
      .distinct()
      .localCheckpoint()
    val eRows = e0.count()
    val loopParts = math.max(1L,
      math.min(partsWas.toLong, eRows / 1000000L + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // out-weights baked in once; pre-partition+sort on the per-round join
    // key so the big side never re-exchanges (the cc discipline)
    val outDeg = e0.groupBy(col("s")).agg(count(lit(1)).as("deg"))
    val w = e0.join(outDeg, "s")
      .select(col("s"), col("t"), (lit(1.0) / col("deg")).as("w"))
      .repartition(loopParts.toInt, col("s"))
      .sortWithinPartitions(col("s"))
      .localCheckpoint()
    val nodes = e0.select(col("s").as("node"))
      .union(e0.select(col("t").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0))
    var round = 0
    while (round < iterations) {
      // dangling nodes (no out-edges) spread their mass uniformly — the
      // 1-row mass aggregate rides INSIDE the round's plan via a cross
      // join (no per-round driver sync, no separate scalar job)
      val dang = ranks.join(outDeg.select(col("s").as("node")),
          Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val contrib = w
        .join(ranks.select(col("node").as("s"), col("rank").as("sr")), "s")
        .groupBy(col("t")).agg(sum(col("sr") * col("w")).as("c"))
        .select(col("t").as("node"), col("c"))
      ranks = ranks.select(col("node"))
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(1.0 - damping)
            + lit(damping) * (coalesce(col("c"), lit(0.0))
              + col("dm") / lit(n))).as("rank"))
        .localCheckpoint() // the round's single materialization barrier
      round += 1
    }
    GraftShim.ofRows(caller, GraftShim.logicalPlan(ranks))
  }

  /** PER-NODE TRIANGLE COUNTS of an undirected graph — the clustering/
    * cohesion primitive (community detection, spam-graph features, dedup
    * cluster sanity). Exact, each triangle counted once, via DEGREE
    * ORIENTATION: orient every edge from its (degree, id)-lexicographic
    * smaller endpoint to the larger, making a DAG where each triangle
    * {x,y,z} survives as exactly one (u→v, u→w, v→w) pattern. The wedge
    * join then fans out on OUT-degree under this orientation, which is
    * O(√E) per node even for hubs — the standard bound that keeps a
    * celebrity node from generating deg² wedges (a naive id-ordered
    * orientation leaves a low-id hub with its full degree as fan-out).
    * Plan shape: distinct edge set, one degree aggregate, a self-join on
    * the oriented heads' shared tail (the wedge), one LEFT SEMI closure
    * probe — all shuffle equi-joins, nothing driver-side, no windows.
    * Output: (node, tri_cnt) for nodes in ≥1 triangle. */
  def triangleCounts(edges0: DataFrame, src: String, dst: String,
      assumeCanonical: Boolean = false): DataFrame = {
    // canonical undirected edge set: (a<b), distinct — skipped (one
    // exchange saved) when the caller guarantees it (coPurchaseEdges)
    val raw = edges0
      .select(col(src).cast("long").as("x"), col(dst).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
    val und =
      if (assumeCanonical) raw.select(col("x").as("a"), col("y").as("b"))
      else raw.select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b")).distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient by (degree, id); carry the head's degree for the wedge
    // ordering (rank(v) < rank(w) picks each closure pair once)
    // The wedge fan-out below is Σ d⁺(u)² rows — orders of magnitude more
    // work than the edge relation itself — and it runs MAP-SIDE (both
    // downstream joins broadcast), so its parallelism is exactly the
    // oriented relation's partition count. AQE coalesces the MB-scale
    // edge relation to 1-2 partitions, which serialized the whole
    // enumeration on 1-2 cores (r17 measurement: a 1.2M-edge / 20k-node
    // co-purchase graph ran its ~10⁸-wedge pipeline in 2 tasks — 16.2 s
    // standalone, 11.3 s in-bench). Widen to the session shuffle width
    // (scale-adaptive: the conf that already sizes every data-scaled
    // exchange — guide §2); the explicit column repartition is exempt
    // from AQE coalescing, and hashing on (u, v) spreads a hub u's
    // wedge work across partitions instead of pinning it to one task.
    val wedgeParts = edges0.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val oriented = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db")
            || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .repartition(wedgeParts, col("u"), col("v"))
      .localCheckpoint() // reused three times: two wedge sides + closure
    val wedges = oriented.as("p").join(oriented.as("q"), "u")
      .filter(col("p.dv") < col("q.dv")
        || (col("p.dv") === col("q.dv") && col("p.v") < col("q.v")))
      .select(col("u"), col("p.v").as("v"), col("q.v").as("w"))
    val tri = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")),
      Seq("v", "w"), "left_semi")
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
  }

  /** Driver-gate query [oracle]: per-part triangle counts of the
    * CO-PURCHASE graph (parts are adjacent when some order contains
    * both) — the classic market-basket cohesion profile. The DuckDB
    * oracle counts the same triangles via the orientation-free
    * canonical a<b<c three-way join; both count each triangle exactly
    * once, so the per-node profiles hash-match. */
  /** CO-PURCHASE edge build shared by the graph gate queries (parts are
    * adjacent when some order contains both) — the BASKET-COLLECT form
    * (r15, replacing the per-order self-join): ONE exchange collects
    * each order's distinct part set (map-side partial collect_set —
    * shuffle volume is baskets, not lineitems; a self-join shuffled the
    * lineitem relation twice and then paid a third exchange to distinct
    * the pairs), the sorted set expands to its a<b pairs in-row (already
    * canonical — no least/greatest pass), and one distinct dedups pairs
    * shared across orders. Basket sizes are order-bounded (≤ items per
    * order), so the in-row expansion is O(k²) with tiny k — skew-safe at
    * any corpus scale. Output: distinct canonical (a < b) edges. */
  def coPurchaseEdgesBuild(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(explode(flatten(expr(
        """transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |    y -> struct(x AS a, y AS b)))""".stripMargin))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
  }

  private val edgeDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The co-purchase edge set as a CONTENT-FINGERPRINT-CACHED parquet
    * artifact (r16 — the ivf/nsw index-dir discipline): five graph gate
    * queries consume the same distinct canonical edge relation, and at
    * any corpus scale a shared derived table is built ONCE and read by
    * every consumer, not recomputed per query. Any layout change needs a
    * NEW dir-name prefix; completion checks the build's _SUCCESS. */
  def edgesDir(spark: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val fp = Similarity.dataFingerprint(s"$d/lineitem.parquet")
    edgeDirs.computeIfAbsent(fp, { _ =>
      val dir = sys.props("java.io.tmpdir") + s"/graft_edges1_$fp"
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        coPurchaseEdgesBuild(spark, d).write.mode("overwrite").parquet(dir)
      dir
    })
  }

  /** The cached co-purchase edge relation (distinct canonical a < b). */
  def coPurchaseEdges(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    spark.read.parquet(edgesDir(spark, d))

  def qGraphTriangles(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    triangleCounts(coPurchaseEdges(spark, d), "a", "b",
      assumeCanonical = true)
      .select(col("node").as("part_id"), col("tri_cnt"))
      .orderBy(col("part_id"))
  }

  /** Synchronous rounds for [[qGraphCommunities]] (fixed — the oracle
    * replays exactly this many). */
  val LpaRounds = 3

  /** LABEL-PROPAGATION COMMUNITY DETECTION (Raghavan, Albert & Kumara
    * 2007 — the near-linear community algorithm curation pipelines use
    * to group near-duplicate/related items beyond connected
    * components): every node starts labeled with its own id; each
    * SYNCHRONOUS round relabels a node with the label most frequent
    * among its neighbors, ties to the SMALLEST label — fully
    * deterministic, so a fixed [[LpaRounds]]-round run is exactly
    * replayable (async/random variants are not). The per-node argmax
    * packs (count, label) into ONE BIGINT key cnt·2³¹ − label so the
    * aggregate stays a sortless HashAggregate (the q_evt_m4 packing
    * rule; ids are require()d < 2³¹).
    *
    * Loop discipline = [[pageRank]]'s: dedicated child session, AQE
    * OFF inside the loop, graph-scaled shuffle width, the neighbor
    * list pre-partitioned+sorted ONCE on the per-round join key,
    * exactly ONE localCheckpoint barrier per round. Two map-side-
    * combined shuffles per round ((v,lab) counts, per-v argmax), both
    * carrying longs only. */
  def labelPropagation(edges0: DataFrame, src: String, dst: String,
      rounds: Int = LpaRounds,
      assumeCanonical: Boolean = false): DataFrame = {
    require(rounds >= 1)
    val caller = edges0.sparkSession
    val spark = caller.newSession()
    val partsWas = caller.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import org.apache.spark.sql.GraftShim
    // canonical undirected edge set (least/greatest + distinct — the
    // triangleCounts rule): an input carrying BOTH orientations of an
    // edge must not double-count that neighbor's label vote
    val eIn = GraftShim.ofRows(spark, GraftShim.logicalPlan(edges0))
      .select(col(src).cast("long").as("x"), col(dst).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
    val e0 = (if (assumeCanonical)
        eIn.select(col("x").as("a"), col("y").as("b"))
      else eIn.select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
        .distinct())
      .localCheckpoint()
    val eRows = e0.count()
    // ~100k edge-rows per partition (r17, was 1M): each round's vote join
    // fans every edge out BOTH ways and re-aggregates — several rows of
    // work per edge row — so 1M-rows/partition serialized a 1.2M-edge
    // graph's rounds onto 2 cores of 32 (guide §2: partition for the
    // work, not the bytes). Tiny near-dup graphs still run 1-2 partitions;
    // billion-edge graphs still cap at the session width.
    val loopParts = math.max(1L,
      math.min(partsWas.toLong, eRows / 100000L + 1L)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    val nbr = e0.select(col("a").as("v"), col("b").as("u"))
      .union(e0.select(col("b").as("v"), col("a").as("u")))
      .repartition(loopParts, col("u")).sortWithinPartitions(col("u"))
      .localCheckpoint()
    val maxId = nbr.agg(max(col("v"))).head().getLong(0)
    require(maxId < (1L << 31),
      s"LPA argmax packing needs node ids < 2^31, got $maxId")
    var labels = nbr.select(col("v").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = nbr
        .join(labels.select(col("node").as("u"), col("lab")), "u")
        .groupBy(col("v"), col("lab")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        // max (cnt, -lab) lexicographic as ONE long key: sortless agg
        .agg(max_by(col("lab"),
          col("cnt") * lit(1L << 31) - col("lab")).as("lab"))
        .select(col("v").as("node"), col("lab"))
        .localCheckpoint() // the round's single materialization barrier
    }
    GraftShim.ofRows(caller, GraftShim.logicalPlan(labels))
  }

  /** Driver-gate query [oracle]: [[LpaRounds]]-round label-propagation
    * communities of the co-purchase graph (the q_graph_triangles edge
    * set). The DuckDB oracle unrolls the synchronous rounds as chained
    * MATERIALIZED CTEs with the identical packed-argmax tie rule, so
    * the full label trajectory is hash-checked. */
  def qGraphCommunities(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    labelPropagation(coPurchaseEdges(spark, d), "a", "b", LpaRounds,
      assumeCanonical = true)
      .select(col("node").as("part_id"), col("lab").as("community"))
      .orderBy(col("part_id"))
  }

  def qGraphCommunitiesSql: String = {
    def roundCte(prev: String, next: String): String =
      s"""$next AS MATERIALIZED (
         |  SELECT v AS node,
         |    arg_max(lab, cnt * 2147483648 - lab) AS lab
         |  FROM (
         |    SELECT n.v, l.lab, CAST(count(*) AS BIGINT) AS cnt
         |    FROM nbr n JOIN $prev l ON n.u = l.node
         |    GROUP BY n.v, l.lab) g
         |  GROUP BY v
         |)""".stripMargin
    val rounds = (1 to LpaRounds).map(i =>
      roundCte(s"l${i - 1}", s"l$i")).mkString(", ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       |nbr AS MATERIALIZED (
       |  SELECT a AS v, b AS u FROM e
       |  UNION ALL SELECT b AS v, a AS u FROM e),
       |l0 AS MATERIALIZED (
       |  SELECT DISTINCT v AS node, v AS lab FROM nbr),
       |$rounds
       |SELECT node AS part_id, CAST(lab AS BIGINT) AS community
       |FROM l$LpaRounds ORDER BY part_id""".stripMargin
  }

  def qGraphTrianglesSql: String =
    """WITH e AS (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |t AS (
      |  SELECT e1.a, e1.b, e2.b AS c
      |  FROM e e1
      |  JOIN e e2 ON e2.a = e1.b
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT part_id, CAST(count(*) AS BIGINT) AS tri_cnt
      |FROM (SELECT unnest([a, b, c]) AS part_id FROM t)
      |GROUP BY part_id ORDER BY part_id""".stripMargin

  /** LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998 — "how close
    * is each node's neighborhood to a clique": C_v = 2·tri_v /
    * (deg_v·(deg_v−1)); the third classic structural read next to the
    * triangle profile and assortativity): per node, degree, triangle
    * count, and the coefficient as a PURE integer ratio —
    * (1e6·2·tri) DIV (deg·(deg−1)), nothing but the counts the
    * triangle machinery already produces. Degree-1 nodes (undefined
    * denominator) drop; triangle-free nodes report 0 via the left
    * join. Reuses [[triangleCounts]]'s degree-oriented enumeration
    * verbatim, so the only new work is the node-bounded degree join.
    * The DuckDB oracle counts the same triangles via the canonical
    * a<b<c three-way join and replays the integer ratio. */
  def qGraphClustering(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val edges0 = coPurchaseEdges(spark, d)
      .localCheckpoint() // feeds degrees + the triangle pass
    val deg = edges0
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(edges0, "a", "b", assumeCanonical = true)
    deg.filter(col("degree") >= 2)
      .join(tri, Seq("node"), "left")
      .withColumn("tri_cnt", coalesce(col("tri_cnt"), lit(0L)))
      .withColumn("cc_scaled", expr(
        "CAST(CAST(2000000 AS DECIMAL(38,0)) * tri_cnt" +
          " DIV (CAST(degree AS DECIMAL(38,0)) * (degree - 1)) AS BIGINT)"))
      .select(col("node").as("part_id"), col("degree"), col("tri_cnt"),
        col("cc_scaled"),
        (col("cc_scaled").cast("double") / 1000000.0).as("clustering"))
      .orderBy(col("part_id"))
  }

  def qGraphClusteringSql: String =
    """WITH e AS MATERIALIZED (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |deg AS MATERIALIZED (
      |  SELECT node, CAST(count(*) AS BIGINT) AS degree
      |  FROM (SELECT unnest([a, b]) AS node FROM e) GROUP BY node),
      |t AS (
      |  SELECT e1.a, e1.b, e2.b AS c
      |  FROM e e1
      |  JOIN e e2 ON e2.a = e1.b
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |tri AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
      |  FROM (SELECT unnest([a, b, c]) AS node FROM t) GROUP BY node)
      |SELECT deg.node AS part_id, deg.degree,
      |  COALESCE(tri.tri_cnt, 0) AS tri_cnt,
      |  CAST(CAST(2000000 AS HUGEINT) * COALESCE(tri.tri_cnt, 0)
      |    // (CAST(deg.degree AS HUGEINT) * (deg.degree - 1)) AS BIGINT)
      |    AS cc_scaled,
      |  CAST(CAST(CAST(2000000 AS HUGEINT) * COALESCE(tri.tri_cnt, 0)
      |    // (CAST(deg.degree AS HUGEINT) * (deg.degree - 1)) AS BIGINT)
      |    AS DOUBLE) / CAST(1000000 AS DOUBLE) AS clustering
      |FROM deg LEFT JOIN tri USING (node)
      |WHERE deg.degree >= 2
      |ORDER BY part_id""".stripMargin

  /** K-CORE DECOMPOSITION (Seidman 1983 — the maximal subgraph where
    * every node keeps degree ≥ k; the standard "dense-enough
    * neighborhood" filter a curation pipeline runs between connected
    * components and communities: periphery nodes peel away, cohesive
    * cores remain): iterative peeling — drop every node whose CURRENT
    * degree is below k, restrict the edge set to survivors, repeat to
    * the fixpoint. Fully deterministic (the fixpoint is unique — the
    * peel order never matters), so a driver-side replay is an exact
    * contract even though the ROUND COUNT is data-dependent (which is
    * why this is [rows]+spec, not oracle: no static CTE unroll exists).
    *
    * Loop discipline = [[connectedComponents]]: dedicated child session,
    * AQE OFF, graph-scaled shuffle width, ONE localCheckpoint barrier +
    * ONE count per round (the count doubles as the convergence test).
    * Every frame is edge- or node-scaled; nothing driver-side. The
    * round cap is a safety net sized for peel DEPTH (a path graph peels
    * from its ends — depth can reach diameter/2), and non-convergence
    * fails loudly rather than returning a wrong partial core. */
  def kCore(edges0: DataFrame, src: String, dst: String,
      k: Int, assumeCanonical: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val caller = edges0.sparkSession
    val spark = caller.newSession()
    val partsWas = caller.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import org.apache.spark.sql.GraftShim
    val ek = GraftShim.ofRows(spark, GraftShim.logicalPlan(edges0))
      .filter(col(src) =!= col(dst))
    val e =
      if (assumeCanonical) ek.select(col(src).cast("long").as("a"),
        col(dst).cast("long").as("b"))
      else ek
        .select(least(col(src), col(dst)).cast("long").as("a"),
          greatest(col(src), col(dst)).cast("long").as("b"))
        .distinct()
    var und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("v"), col("b").as("u"))
      .localCheckpoint()
    var prev = und.count()
    // ~100k rows/partition (r17, was 1M) — the labelPropagation rule:
    // each peel round joins the full undirected relation twice; 1M-row
    // partitions ran a 2.4M-row graph's rounds on 2-3 cores of 32
    val loopParts = math.max(1L,
      math.min(partsWas.toLong, prev / 100000L + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < 256) {
      val keep = und.groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("v"))
      val next = und
        .join(keep, "v") // v-side survivor restriction
        .join(keep.select(col("v").as("u")), "u") // u-side
        .select(col("v"), col("u"))
        .localCheckpoint() // the round's single materialization barrier
      val cnt = next.count()
      changed = prev - cnt
      prev = cnt
      und = next
      round += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"kCore did not converge in $round rounds — refusing to return " +
          "a partial (non-fixpoint) core")
    val res = und.groupBy(col("v")).agg(count(lit(1)).as("core_deg"))
      .select(col("v").as("node"), col("core_deg"))
    GraftShim.ofRows(caller, GraftShim.logicalPlan(res))
  }

  /** Core order for the gate query (3-core: the first genuinely cohesive
    * shell — 2-cores keep every cycle). */
  val KCoreK = 3

  /** Driver-gate query [rows]: members of the co-purchase graph's
    * [[KCoreK]]-core with their within-core degrees (GraphPropertySpec
    * replays the peel exactly on cliques, chains and random graphs). */
  def qGraphKcore(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    kCore(coPurchaseEdges(spark, d), "a", "b", KCoreK,
      assumeCanonical = true)
      .select(col("node").as("part_id"), col("core_deg"))
      .orderBy(col("part_id"))
  }

  /** DEGREE ASSORTATIVITY (Newman 2002 — do high-degree nodes attach to
    * high-degree nodes?): the Pearson correlation of endpoint degrees
    * over all edge orientations. Social/co-occurrence graphs run
    * positive, technological/dependency graphs negative — the one-number
    * structural fingerprint next to the triangle profile. On an
    * UNDIRECTED graph summed over both orientations the x and y marginals
    * coincide, so the usual sqrt-denominator collapses and
    * r = (M₂·Σxy − Sx²) / (M₂·Σx² − Sx²) with M₂ = 2·|E|,
    * Sx = Σ_e (deg_a + deg_b), Σxy = Σ_e 2·deg_a·deg_b,
    * Σx² = Σ_e (deg_a² + deg_b²) — every term an exact integer
    * (DECIMAL(38,0)/HUGEINT products; NO sqrt, NO float), reported via
    * the (1e6·num) DIV den rule. A degree-regular graph (den = 0) drops.
    *
    * Scale shape: distinct canonical edges materialize once and feed the
    * degree count (one exploded long shuffle) and two hint-free
    * degree joins (degree relation is node-bounded); the fold is one
    * row. Never an adjacency matrix, never a per-node collect. */
  def qGraphAssortativity(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    assortativity(coPurchaseEdges(spark, d), "a", "b",
      assumeCanonical = true)
  }

  /** Core of [[qGraphAssortativity]] over any edge relation (canonical
    * least/greatest + distinct applied here — an input carrying both
    * orientations or duplicates must not double-count; self-loops
    * drop — skipped when the caller guarantees canonical input). */
  def assortativity(edges0: DataFrame, srcCol: String,
      dstCol: String, assumeCanonical: Boolean = false): DataFrame = {
    val eIn = edges0.filter(col(srcCol) =!= col(dstCol))
    val edges = (if (assumeCanonical)
        eIn.select(col(srcCol).as("a"), col(dstCol).as("b"))
      else eIn
        .select(least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .distinct())
      .localCheckpoint() // feeds the degree count + the stats pass
    val deg = edges
      .select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val stats = edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .agg(count(lit(1)).cast("long").as("n_edges"),
        sum(d38(col("da")) + col("db")).as("sx"),
        sum(d38(col("da")) * col("db") * 2).as("sxy"),
        sum(d38(col("da")) * col("da") + d38(col("db")) * col("db"))
          .as("sxx"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    stats.crossJoin(nodes)
      .withColumn("num", expr(
        "CAST(2 AS DECIMAL(38,0)) * n_edges * sxy - sx * sx"))
      .withColumn("den", expr(
        "CAST(2 AS DECIMAL(38,0)) * n_edges * sxx - sx * sx"))
      .filter(col("den") =!= 0)
      .withColumn("r_scaled", expr(
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * num DIV den AS BIGINT)"))
      .select(col("n_nodes"), col("n_edges"), col("r_scaled"),
        (col("r_scaled").cast("double") / 1000000.0).as("assortativity"))
  }

  def qGraphAssortativitySql: String =
    """WITH e AS MATERIALIZED (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |deg AS MATERIALIZED (
      |  SELECT v, CAST(count(*) AS BIGINT) AS deg
      |  FROM (SELECT unnest([a, b]) AS v FROM e) GROUP BY v),
      |st AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
      |    sum(CAST(pa.deg AS HUGEINT) + pb.deg) AS sx,
      |    sum(CAST(pa.deg AS HUGEINT) * pb.deg * 2) AS sxy,
      |    sum(CAST(pa.deg AS HUGEINT) * pa.deg
      |      + CAST(pb.deg AS HUGEINT) * pb.deg) AS sxx
      |  FROM e JOIN deg pa ON pa.v = e.a JOIN deg pb ON pb.v = e.b),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
      |SELECT n_nodes, n_edges,
      |  CAST(CAST(1000000 AS HUGEINT)
      |    * (2 * CAST(n_edges AS HUGEINT) * sxy - sx * sx)
      |    // (2 * CAST(n_edges AS HUGEINT) * sxx - sx * sx) AS BIGINT)
      |    AS r_scaled,
      |  CAST(CAST(CAST(1000000 AS HUGEINT)
      |    * (2 * CAST(n_edges AS HUGEINT) * sxy - sx * sx)
      |    // (2 * CAST(n_edges AS HUGEINT) * sxx - sx * sx) AS BIGINT)
      |    AS DOUBLE) / CAST(1000000 AS DOUBLE) AS assortativity
      |FROM st CROSS JOIN nn
      |WHERE 2 * CAST(n_edges AS HUGEINT) * sxx - sx * sx <> 0""".stripMargin

  /** Wedge centers above this degree are excluded from link-prediction
    * candidate generation: a hub's pair expansion is deg² while its RA
    * mass per pair is 1/deg → ~0 — the published hub-cap practice
    * (candidate generation in RA/AA link prediction is wedge-bounded).
    * The cap is part of the OPERATOR'S DEFINITION; the oracle replays
    * it, so the scores are exact, not approximate. */
  val LinkpredDegCap = 64

  /** LINK PREDICTION — Resource-Allocation index (Zhou, Lü & Zhang
    * 2009: RA(x,y) = Σ_{z ∈ Γ(x)∩Γ(y)} 1/deg(z); the top performer of
    * the classic local indices, and unlike Adamic–Adar it is a SUM OF
    * RATIONALS — each term quantizes as 1e6 DIV deg with no libm at
    * all, the r14 ratio-of-counts exactness class). The
    * similar-products / "users also bought" primitive over the
    * co-purchase graph: score NON-adjacent part pairs by the resource
    * their shared neighborhoods allocate, report the global top-100.
    *
    * Plan shape (the basket-collect discipline): ONE groupBy(z)
    * collects each capped center's sorted neighbor set, pairs expand
    * in-row (bounded by cap² per center — skew-safe by construction),
    * one groupBy(x,y) sums counts + quantized RA terms, an anti-join
    * drops existing edges, and the global top-100 is a TakeOrdered,
    * never a full sort. Every score is an exact integer both engines
    * replay; ties order by (cn, part_a, part_b) — total, deterministic. */
  def qGraphLinkpred(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val edges0 = coPurchaseEdges(spark, d)
      .localCheckpoint() // feeds adjacency, the anti-join, and degrees
    val adj = edges0.select(col("a").as("z"), col("b").as("n"))
      .unionAll(edges0.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val wedges = adj
      .join(deg.filter(col("deg").between(2, LinkpredDegCap)), "z")
      .groupBy(col("z"), col("deg"))
      .agg(sort_array(collect_set(col("n"))).as("ns"))
      // the in-row pair expansion below fans each mediator out deg²/2
      // ways; AQE coalesces the node-bounded grouped relation to 1-2
      // partitions, serializing the expansion + the next partial
      // aggregate on 1-2 cores — widen to the session shuffle width
      // (explicit column repartition: exempt from AQE coalescing)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("z"))
      .select(col("deg"), explode(flatten(expr(
        """transform(ns, (x, i) ->
          |  transform(slice(ns, i + 2, size(ns)),
          |    y -> struct(x AS a, y AS b)))""".stripMargin))).as("e"))
      .select(col("e.a").as("part_a"), col("e.b").as("part_b"),
        expr("1000000 DIV deg").as("term"))
    wedges.groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("cn"), sum(col("term")).as("ra_scaled"))
      .join(edges0.select(col("a").as("part_a"), col("b").as("part_b")),
        Seq("part_a", "part_b"), "left_anti")
      .select(col("part_a"), col("part_b"), col("cn"),
        col("ra_scaled").cast("long").as("ra_scaled"),
        (col("ra_scaled").cast("double") / 1000000.0).as("ra"))
      .orderBy(col("ra_scaled").desc, col("cn").desc, col("part_a"),
        col("part_b"))
      .limit(100)
  }

  def qGraphLinkpredSql: String =
    """WITH e AS MATERIALIZED (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |adj AS MATERIALIZED (
      |  SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
      |deg AS MATERIALIZED (
      |  SELECT z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY z),
      |w AS (
      |  SELECT a1.n AS part_a, a2.n AS part_b, d.deg
      |  FROM adj a1 JOIN adj a2 ON a1.z = a2.z AND a1.n < a2.n
      |  JOIN deg d ON d.z = a1.z
      |  WHERE d.deg BETWEEN 2 AND 64),
      |s AS (
      |  SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS cn,
      |    CAST(sum(1000000 // deg) AS BIGINT) AS ra_scaled
      |  FROM w
      |  WHERE NOT EXISTS (SELECT 1 FROM e
      |    WHERE e.a = w.part_a AND e.b = w.part_b)
      |  GROUP BY part_a, part_b)
      |SELECT part_a, part_b, cn, ra_scaled,
      |  CAST(ra_scaled AS DOUBLE) / CAST(1000000 AS DOUBLE) AS ra
      |FROM s
      |ORDER BY ra_scaled DESC, cn DESC, part_a, part_b
      |LIMIT 100""".stripMargin

  /** NODE SIMILARITY [oracle] — Jaccard overlap of neighborhoods
    * (the SimRank-lite "customers who bought these parts also bought"
    * score; Salton/Jaccard node similarity, the q_graph_linkpred
    * sibling): for part pairs sharing ≥1 common neighbor,
    * J = |N(u)∩N(v)| / (deg u + deg v − |N(u)∩N(v)|), top 100.
    * Common neighbors enumerate through the SAME degree-capped wedge
    * relation linkpred uses ([[LinkpredDegCap]] — hub mediators beyond
    * the cap are excluded from the common-neighbor count by declared
    * semantics, both engines; a hub z would otherwise fan out deg²
    * pairs). Degrees in the denominator are the FULL degrees.
    * jac_scaled = ⌊10⁶·cn⌋ DIV (deg_a + deg_b − cn) — a pure
    * ratio-of-counts, exact in both engines; `linked` flags pairs that
    * are already edges (similar-but-unlinked rows are the
    * recommendation candidates linkpred ranks by RA instead).
    *
    * Scale shape: one adjacency exchange + the capped in-row pair
    * expansion (the linkpred plan), two vocab-bounded degree joins, a
    * deterministic top-100 cut. */
  def qGraphNodesim(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val edges0 = coPurchaseEdges(spark, d)
      .localCheckpoint() // feeds adjacency, the linked flag, and degrees
    val adj = edges0.select(col("a").as("z"), col("b").as("n"))
      .unionAll(edges0.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val pairs = adj
      .join(deg.filter(col("deg").between(2, LinkpredDegCap)), "z")
      .groupBy(col("z"))
      .agg(sort_array(collect_set(col("n"))).as("ns"))
      // widen before the deg²/2 in-row expansion (the qGraphLinkpred rule)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("z"))
      .select(explode(flatten(expr(
        """transform(ns, (x, i) ->
          |  transform(slice(ns, i + 2, size(ns)),
          |    y -> struct(x AS a, y AS b)))""".stripMargin))).as("e"))
      .select(col("e.a").as("part_a"), col("e.b").as("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("cn"))
    pairs
      .join(deg.select(col("z").as("part_a"), col("deg").as("deg_a")),
        "part_a")
      .join(deg.select(col("z").as("part_b"), col("deg").as("deg_b")),
        "part_b")
      .join(edges0.select(col("a").as("part_a"), col("b").as("part_b"),
        lit(true).as("linked")), Seq("part_a", "part_b"), "left")
      .withColumn("linked", coalesce(col("linked"), lit(false)))
      .select(col("part_a"), col("part_b"), col("cn"),
        col("deg_a"), col("deg_b"),
        expr("CAST(1000000 * cn DIV (deg_a + deg_b - cn) AS BIGINT)")
          .as("jac_scaled"),
        col("linked"))
      .withColumn("jaccard",
        col("jac_scaled").cast("double") / lit(1000000.0))
      .orderBy(col("jac_scaled").desc, col("cn").desc, col("part_a"),
        col("part_b"))
      .limit(100)
  }

  def qGraphNodesimSql: String =
    """WITH e AS MATERIALIZED (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |adj AS MATERIALIZED (
      |  SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
      |deg AS MATERIALIZED (
      |  SELECT z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY z),
      |s AS (
      |  SELECT a1.n AS part_a, a2.n AS part_b,
      |    CAST(count(*) AS BIGINT) AS cn
      |  FROM adj a1 JOIN adj a2 ON a1.z = a2.z AND a1.n < a2.n
      |  JOIN deg d ON d.z = a1.z
      |  WHERE d.deg BETWEEN 2 AND 64
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT s.part_a, s.part_b, s.cn, da.deg AS deg_a,
      |    db.deg AS deg_b,
      |    CAST(1000000 * s.cn // (da.deg + db.deg - s.cn) AS BIGINT)
      |      AS jac_scaled,
      |    EXISTS (SELECT 1 FROM e
      |      WHERE e.a = s.part_a AND e.b = s.part_b) AS linked
      |  FROM s JOIN deg da ON da.z = s.part_a
      |  JOIN deg db ON db.z = s.part_b)
      |SELECT part_a, part_b, cn, deg_a, deg_b, jac_scaled,
      |  CAST(jac_scaled AS DOUBLE) / CAST(1000000 AS DOUBLE) AS jaccard,
      |  linked
      |FROM j
      |ORDER BY jac_scaled DESC, cn DESC, part_a, part_b
      |LIMIT 100""".stripMargin

  /** Landmark count / BFS horizon for [[qGraphCloseness]]. */
  val ClosenessLandmarks = 8
  val ClosenessMaxDepth = 6

  /** LANDMARK HARMONIC CLOSENESS [oracle] — centrality without the
    * all-pairs cost (the published landmark/pivot estimate: BFS from K
    * fixed seeds, harmonic sum over reached landmarks; cf. Boldi &
    * Vigna 2014's harmonic form, which handles disconnection without
    * infinities). Landmarks = the [[ClosenessLandmarks]] smallest node
    * ids (deterministic in both engines); BFS depth caps at
    * [[ClosenessMaxDepth]] (small-world co-purchase graphs saturate in
    * ~6 hops). Exactness: per node, h60 = Σ_reached ⌊60 / dist⌋ — 60 =
    * lcm(1..6), so every 1/d term is an EXACT integer (60,30,20,15,
    * 12,10) and the sum replays bit-identically; the double `closeness`
    * is h60/60 (exact binary scaling of small ints — no libm). The
    * oracle walks the same frontier as a recursive CTE and collapses
    * re-reaches with min(dist); the Spark loop's visited anti-join
    * never re-adds a node, so both compute first-reach distances.
    *
    * Scale shape: the visited frame is ≤ K·V rows of three longs; each
    * of ≤ 6 rounds is frontier ⋈ adjacency (frontier-sized, shrinking)
    * with ONE localCheckpoint + one count (the kCore loop discipline,
    * AQE off in a forked session, shuffle width scaled to the frame). */
  def qGraphCloseness(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    harmonicCloseness(coPurchaseEdges(spark, d), "a", "b",
      assumeCanonical = true)

  /** The reusable BFS core of [[qGraphCloseness]] — landmark harmonic
    * closeness over any undirected edge relation (canonicalized
    * least/greatest + distinct unless `assumeCanonical` — the LPA
    * double-count rule). */
  def harmonicCloseness(edgesIn: DataFrame, src: String, dst: String,
      assumeCanonical: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val caller = edgesIn.sparkSession
    val s = caller.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val ek = GraftShim.ofRows(s, GraftShim.logicalPlan(edgesIn))
      .filter(col(src) =!= col(dst))
    val edges0 =
      if (assumeCanonical) ek.select(col(src).cast("long").as("a"),
        col(dst).cast("long").as("b"))
      else ek
        .select(least(col(src), col(dst)).cast("long").as("a"),
          greatest(col(src), col(dst)).cast("long").as("b"))
        .distinct()
    val adj0 = edges0.select(col("a").as("z"), col("b").as("n"))
      .unionAll(edges0.select(col("b").as("z"), col("a").as("n")))
    // PACKED-LANE BFS (r17 — guide §2.3/§2.4, replacing the per-landmark
    // frontier walk): K ≤ 8 landmarks ride ONE long bitmask per node
    // (lane i = i-th landmark) plus ONE long of 8 packed distance bytes,
    // so a round is a single map-side-combined bit_or aggregate over the
    // adjacency — the old form materialized the frontier×degree fan-out
    // (~13M rows/round on a 1.2M-edge co-purchase graph), DISTINCTed it,
    // and anti-joined the visited set: three shuffles of wedge-scale data
    // per round vs one ~node-count-sized aggregate output here. First
    // round a bit appears = exact BFS distance (OR-reach within r hops),
    // so h60/n_reached replay the old walk bit-identically.
    require(ClosenessLandmarks <= 8,
      s"packed-lane BFS carries at most 8 landmarks, got $ClosenessLandmarks")
    val partsWas = caller.conf.get("spark.sql.shuffle.partitions")
    // width from the INPUT edge count (a metadata-cheap count on a parquet
    // edge relation) so the adjacency materializes exactly once, already
    // partitioned+sorted on the per-round join key (the
    // connectedComponents discipline) — checkpointing it twice (raw, then
    // repartitioned) cost more than the whole BFS loop
    val loopParts = math.max(1L,
      math.min(partsWas.toLong, 2L * edgesIn.count() / 100000L + 1L)).toInt
    s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    val adj = adj0.repartition(loopParts, col("z"))
      .sortWithinPartitions(col("z")).localCheckpoint()
    // lane assignment: the K smallest node ids (bounded driver list —
    // the routing-map class)
    val lmIds = adj.select(col("z")).distinct()
      .orderBy(col("z")).limit(ClosenessLandmarks)
      .collect().map(_.getLong(0))
    import s.implicits._
    // state rows carry nb = the bits gained LAST round: a neighbor whose
    // mask did not change contributes nothing new (its previous mask was
    // absorbed a round earlier — the standard delta-BFS argument), so each
    // round joins the adjacency against the CHANGED rows' new bits only.
    // Round volume is the true frontier fan-out, not |E| every round.
    // K-row LocalRelation — no shuffle, no checkpoint (round 1's barrier
    // materializes it; checkpointing 8 rows cost a full fixed job)
    var state = lmIds.zipWithIndex.toSeq
      .map { case (id, i) => (id, 1L << i, 0L, 1L << i) }
      .toDF("node", "m", "d", "nb")
    var depth = 0
    var changed = 1L
    while (changed > 0 && depth < ClosenessMaxDepth) {
      depth += 1
      val orr = adj
        .join(state.filter(col("nb") =!= 0L)
          .select(col("node").as("z"), col("nb").as("sm")), "z")
        .groupBy(col("n")).agg(expr("bit_or(sm)").as("orr"))
        .select(col("n").as("node"), col("orr"))
      // deposit each NEW lane's distance byte: byte i = depth where bit i
      // first appeared (lanes are disjoint, so the sum never carries)
      val nb = coalesce(col("orr"), lit(0L))
        .bitwiseAND(bitwise_not(coalesce(col("m"), lit(0L))))
      val dep = (0 until ClosenessLandmarks).map(i =>
        shiftright(col("nb"), i).bitwiseAND(lit(1L)) * lit(1L << (8 * i)))
        .reduce(_ + _)
      val next = state.join(orr, Seq("node"), "full_outer")
        .withColumn("nb", nb)
        .select(col("node"),
          (coalesce(col("m"), lit(0L))
            .bitwiseOR(coalesce(col("orr"), lit(0L)))).as("m"),
          (coalesce(col("d"), lit(0L)) + dep * lit(depth.toLong)).as("d"),
          col("nb"))
        .localCheckpoint() // the round's single materialization barrier
      changed = next.filter(col("nb") =!= 0L).count()
      state = next
    }
    // per-lane fold: a byte > 0 is a landmark reached at that exact BFS
    // distance (the landmark's own lane keeps byte 0 and is excluded,
    // matching the old dist > 0 filter); 60 DIV byte is the exact h60 term
    val lanes = (0 until ClosenessLandmarks).map(i =>
      shiftright(col("d"), 8 * i).bitwiseAND(lit(255L)).as(s"b$i"))
    val res = state.select(col("node") +: lanes: _*)
      .select(col("node"),
        (0 until ClosenessLandmarks).map(i =>
          when(col(s"b$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
          .as("n_reached"),
        (0 until ClosenessLandmarks).map(i =>
          when(col(s"b$i") > 0, expr(s"60 DIV b$i")).otherwise(0L))
          .reduce(_ + _).as("h60"))
      .filter(col("n_reached") > 0)
      .withColumn("closeness", col("h60").cast("double") / lit(60.0))
      .orderBy(col("node"))
    GraftShim.ofRows(caller, GraftShim.logicalPlan(res))
  }

  def qGraphClosenessSql: String =
    s"""WITH RECURSIVE e AS MATERIALIZED (
       |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       |adj AS MATERIALIZED (
       |  SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
       |lm AS MATERIALIZED (
       |  SELECT z FROM (SELECT DISTINCT z FROM adj) t
       |  ORDER BY z LIMIT $ClosenessLandmarks),
       |bfs AS (
       |  SELECT z AS lm, z AS node, 0 AS dist FROM lm
       |  UNION
       |  SELECT bfs.lm, adj.n AS node, bfs.dist + 1 AS dist
       |  FROM bfs JOIN adj ON adj.z = bfs.node
       |  WHERE bfs.dist < $ClosenessMaxDepth),
       |md AS (
       |  SELECT lm, node, min(dist) AS dist FROM bfs GROUP BY 1, 2)
       |SELECT node,
       |  CAST(count(CASE WHEN dist > 0 THEN 1 END) AS BIGINT)
       |    AS n_reached,
       |  CAST(sum(CASE WHEN dist > 0 THEN 60 // dist ELSE 0 END)
       |    AS BIGINT) AS h60,
       |  CAST(CAST(sum(CASE WHEN dist > 0 THEN 60 // dist ELSE 0 END)
       |    AS BIGINT) AS DOUBLE) / CAST(60 AS DOUBLE) AS closeness
       |FROM md
       |WHERE dist > 0
       |GROUP BY node
       |ORDER BY node""".stripMargin
}
