package graft

import graft.operators.Graph

/** Randomized adversarial coverage for the round-3 CC rewrite: seeded
  * random graphs (sparse, dense, chain-heavy) checked against a
  * driver-side union-find, plus the degenerate shapes that broke naive
  * iterative formulations. */
class GraphPropertySpec extends GraftSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // only nodes that appear in a non-self-loop edge are labeled by CC
    val nodes = edges.collect { case (a, b) if a != b => Seq(a, b) }.flatten.toSet
    nodes.map(n => n -> find(n)).toMap
  }

  private def check(edges: Seq[(Long, Long)], tag: String): Unit = {
    val got = Graph.connectedComponents(edges.toDF("s", "t"), "s", "t")
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(edges), s"component labels diverged on: $tag")
  }

  test("random graphs match union-find across density regimes") {
    val rnd = new scala.util.Random(7)
    for ((n, m, tag) <- Seq(
        (12, 6, "sparse"), (20, 15, "medium"), (15, 40, "dense"),
        (40, 25, "forest-ish"), (30, 30, "mixed"))) {
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      check(edges, s"$tag n=$n m=$m seed-stream")
    }
  }

  test("degenerate shapes: self-loops, duplicates, reversed, late merges") {
    // self-loops only → no labeled nodes
    val selfOnly = Graph.connectedComponents(
      Seq((5L, 5L), (9L, 9L)).toDF("s", "t"), "s", "t").count()
    assert(selfOnly == 0)
    // duplicate + reversed edges collapse to one component
    check(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)), "dup+reversed")
    // two long chains that merge only at their far ends (max label distance)
    val chainA = (100L until 120L).map(i => (i, i + 1))
    val chainB = (200L until 220L).map(i => (i, i + 1))
    check(chainA ++ chainB :+ ((120L, 220L)), "late-merging chains")
    // star on the LARGEST id + a ring
    val star = (0L until 8L).map(i => (99L, i))
    val ring = (50L until 58L).map(i => (i, i + 1)) :+ ((58L, 50L))
    check(star ++ ring, "star+ring")
  }

  /** Driver-side PageRank reference: identical formula (uniform init at
    * 1.0, per-round dangling redistribution, (1-d) + d*(contrib +
    * dangling/n)) so the distributed loop must agree to float noise. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val dedup = edges.distinct
    val nodes = dedup.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = dedup.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = nodes.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val contrib = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      out.foreach { case (s0, ts) =>
        val share = rank(s0) / ts.size
        ts.foreach(t => contrib(t) += share)
      }
      rank = nodes.map(v =>
        v -> ((1.0 - d) + d * (contrib(v) + dangling / n))).toMap
    }
    rank
  }

  test("pageRank matches the driver reference, conserves total rank, " +
      "ranks hubs above leaves, and stays in its job budget") {
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 1L), // cycle
      (4L, 1L), (5L, 1L), (6L, 1L), // a hub at 1
      (7L, 8L), // 8 is dangling (no out-edges)
      (2L, 3L) // duplicate edge (deduped)
    )
    val expect = refPageRank(edges, 8, 0.85)
    val counted = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counted.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try {
        val r = Graph.pageRank(edges.toDF("s", "t"), "s", "t",
          iterations = 8).as[(Long, Double)].collect().toMap
        org.apache.spark.sql.GraftShim.drainListenerBus(spark)
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(got.keySet == expect.keySet)
    got.foreach { case (node, r) =>
      assert(math.abs(r - expect(node)) < 1e-9,
        s"rank($node) = $r, expected ${expect(node)}")
    }
    assert(math.abs(got.values.sum - got.size) < 1e-6,
      "total rank not conserved at n")
    assert(got(1L) > got(4L) && got(1L) > got(7L), "hub must out-rank leaves")
    val jobs = counted.get()
    // storm guard (the 120-job CC regression class), not exact accounting:
    // ~5 jobs/round observed (broadcast builds + barrier), linear in rounds
    assert(jobs < 8 * 6 + 12, s"pageRank launched $jobs jobs (budget ${8 * 6 + 12})")
  }

  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val counts = scala.collection.mutable.Map[Long, Long]()
    for ((a, b) <- und; c <- adj(a).intersect(adj(b)); if c > b)
      Seq(a, b, c).foreach(n => counts(n) = counts.getOrElse(n, 0L) + 1L)
    counts.toMap
  }

  test("triangleCounts matches brute force on K4, random graphs, and " +
      "degenerate shapes (self-loops, duplicates, reversed edges)") {
    def check(edges: Seq[(Long, Long)], tag: String): Unit = {
      val got = Graph.triangleCounts(edges.toDF("s", "t"), "s", "t")
        .as[(Long, Long)].collect().toMap
      assert(got == refTriangles(edges), s"triangle profile diverged: $tag")
    }
    // K4: four triangles, every node in exactly 3
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    check(k4, "K4")
    // triangle + pendant + disconnected edge + self-loop + dup + reversed
    check(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L),
      (7L, 7L), (2L, 1L), (1L, 2L)), "degenerate")
    // triangle-free (bipartite): empty profile
    check(Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)), "bipartite")
    // seeded random graphs across densities
    val rnd = new scala.util.Random(41)
    for ((n, m) <- Seq((30, 60), (40, 300), (12, 66))) {
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      check(edges, s"random n=$n m=$m")
    }
  }

  test("labelPropagation matches a driver-side synchronous replay on " +
      "cliques, bridges, and random graphs; separated cliques get " +
      "distinct uniform communities") {
    val sess = spark; import sess.implicits._
    def replay(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val und = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).distinct
      val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lab: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
      for (_ <- 1 to rounds) {
        lab = nbrs.map { case (v, us) =>
          val cnt = us.groupBy(lab).view.mapValues(_.size).toMap
          v -> cnt.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      lab
    }
    def check(edges: Seq[(Long, Long)], tag: String): Map[Long, Long] = {
      val got = graft.operators.Graph.labelPropagation(
        edges.toDF("a", "b"), "a", "b").collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lab")).toMap
      val want = replay(edges, graft.operators.Graph.LpaRounds)
      assert(got == want, s"$tag: got $got\nwant $want")
      got
    }
    def clique(ids: Seq[Long]): Seq[(Long, Long)] =
      for (i <- ids.indices; j <- i + 1 until ids.size)
        yield (ids(i), ids(j))
    // two disjoint cliques → each uniform under its own label
    val sep = check(clique(1L to 5L) ++ clique(20L to 24L), "separated")
    assert((1L to 5L).map(sep).toSet.size == 1, s"clique A split: $sep")
    assert((20L to 24L).map(sep).toSet.size == 1, s"clique B split: $sep")
    assert(sep(1L) != sep(20L), "disjoint cliques must differ")
    // bridged cliques and random graphs: replay equality is the contract
    check(clique(1L to 5L) ++ clique(20L to 24L) :+ ((5L, 20L)), "bridged")
    val rnd = new scala.util.Random(97)
    for ((n, m) <- Seq((25, 40), (30, 200))) {
      check(Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2), s"random n=$n m=$m")
    }
  }

  test("degree assortativity: star = -1, exact replay on random graphs, " +
      "regular graphs drop (den = 0)") {
    def ref(edges0: Seq[(Long, Long)]): Option[(Long, Long, Long)] = {
      val edges = edges0.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val deg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val m = BigInt(edges.size)
      val sx = edges.map(e => BigInt(deg(e._1)) + deg(e._2)).sum
      val sxy = edges.map(e => BigInt(deg(e._1)) * deg(e._2) * 2).sum
      val sxx = edges.map(e =>
        BigInt(deg(e._1)) * deg(e._1) + BigInt(deg(e._2)) * deg(e._2)).sum
      val num = 2 * m * sxy - sx * sx
      val den = 2 * m * sxx - sx * sx
      if (den == 0) None
      else Some((deg.size.toLong, edges.size.toLong,
        (BigInt(1000000) * num / den).toLong))
    }
    def got(edges: Seq[(Long, Long)]): Option[(Long, Long, Long)] =
      Graph.assortativity(edges.toDF("s", "t"), "s", "t").collect()
        .headOption.map(r => (r.getAs[Long]("n_nodes"),
          r.getAs[Long]("n_edges"), r.getAs[Long]("r_scaled")))
    // star K_{1,6}: hub-leaf degrees perfectly anticorrelated → r = −1
    val star = (1L to 6L).map(i => (0L, i))
    assert(got(star) == ref(star))
    assert(got(star).get._3 == -1000000L, s"star r: ${got(star)}")
    // a triangle is 2-regular: den = 0, row drops
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(got(tri).isEmpty && ref(tri).isEmpty)
    // duplicates + both orientations must not change the answer
    assert(got(star ++ star.map(e => (e._2, e._1))) == ref(star))
    // random graphs: exact replay equality is the contract
    val rnd = new scala.util.Random(31)
    for ((n, m) <- Seq((12, 18), (25, 60), (8, 28))) {
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(got(edges) == ref(edges), s"diverged on n=$n m=$m")
    }
  }

  test("clustering coefficient: gate query equals a brute-force driver " +
      "replay over the co-purchase graph") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val pks = g.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.size)
        yield (pks(i), pks(j))
    }.toSet
    val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = nbrs.collect { case (v, ns) if ns.size >= 2 =>
      val d = ns.size.toLong
      val tri = ns.toSeq.combinations(2)
        .count { case Seq(a, b) => nbrs(a)(b) }.toLong
      v -> ((d, tri, BigInt(2000000) * tri / (BigInt(d) * (d - 1))))
    }
    val got = Graph.qGraphClustering(spark, sf).collect()
      .map(r => r.getAs[Long]("part_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("tri_cnt"),
          BigInt(r.getAs[Long]("cc_scaled"))))).toMap
    assert(got == want.toMap, s"first diffs: ${
      got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
        .filter(p => p._1 != p._2).take(3)}")
    assert(got.nonEmpty && got.values.exists(_._3 > 0))
  }

  test("k-core: peel fixpoint equals a driver-side replay on cliques, " +
      "deep chains, and random graphs") {
    def ref(edges0: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
      var edges = edges0.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      var changed = true
      while (changed) {
        val deg = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => keep(e._1) && keep(e._2))
        changed = next.size != edges.size
        edges = next
      }
      edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    def got(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
      Graph.kCore(edges.toDF("s", "t"), "s", "t", k).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    // K5 clique + a pendant chain: the clique IS the 3-core, all of the
    // chain (and nothing of the clique) peels
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val chain = Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val g1 = got(clique ++ chain, 3)
    assert(g1 == ref(clique ++ chain, 3))
    assert(g1.keySet == (1L to 5L).toSet && g1.values.forall(_ == 4L))
    // k=2 on a long path: peels one layer per round from both ends (the
    // DEEP-peel case the round cap must survive) until nothing remains
    val path = (0L until 30L).map(i => (i, i + 1))
    assert(got(path, 2) == ref(path, 2))
    assert(got(path, 2).isEmpty)
    // a cycle is its own 2-core
    val cycle = path :+ ((30L, 0L))
    val g2 = got(cycle, 2)
    assert(g2 == ref(cycle, 2) && g2.size == 31)
    // random graphs, both orientations + duplicates in the input
    val rnd = new scala.util.Random(53)
    for ((n, m, k) <- Seq((20, 40, 3), (15, 70, 4), (25, 35, 2))) {
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val doubled = edges ++ edges.map(e => (e._2, e._1))
      assert(got(doubled, k) == ref(edges, k), s"diverged on n=$n m=$m k=$k")
    }
  }

  test("landmark harmonic closeness: exact BFS replay on paths, stars, " +
      "disconnected unions and random graphs; h60 terms are the exact " +
      "60/d integers") {
    // driver-side reference: BFS from the K smallest node ids, depth
    // cap 6, h60 = sum of 60/d over reached landmarks (integer division
    // is exact: 60 = lcm(1..6))
    def ref(edges0: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
      val es = edges0.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val adj = (es ++ es.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = adj.keys.toSeq.sorted
      val lms = nodes.take(Graph.ClosenessLandmarks)
      val dist = scala.collection.mutable.Map[(Long, Long), Long]()
      lms.foreach { lm =>
        var frontier = Set(lm); dist((lm, lm)) = 0L
        (1 to Graph.ClosenessMaxDepth).foreach { d =>
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
            .filterNot(n => dist.contains((lm, n)))
          frontier.foreach(n => dist((lm, n)) = d.toLong)
        }
      }
      dist.toSeq.filter(_._2 > 0).groupBy(_._1._2).map { case (n, ds) =>
        n -> (ds.size.toLong, ds.map(60L / _._2).sum)
      }
    }
    def got(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
      Graph.harmonicCloseness(edges.toDF("s", "t"), "s", "t").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // path 0-1-...-12: node 6 sees landmarks 0..7 at known distances
    val path = (0L until 12L).map(i => (i, i + 1))
    assert(got(path) == ref(path))
    // star: center reaches every landmark at 1, leaves at 2 via center
    val star = (1L to 20L).map(i => (0L, i))
    val gs = got(star)
    assert(gs == ref(star))
    assert(gs(0L) == ((7L, 7L * 60L)), gs(0L)) // center: 7 other landmarks at d=1
    // disconnected union: landmarks all land in the first component —
    // the second component's nodes reach none and drop out
    val comp2 = (100L to 105L).map(i => (i, i + 1))
    val gd = got(path ++ comp2)
    assert(gd == ref(path ++ comp2))
    assert(!gd.keys.exists(_ >= 100L),
      "unreachable component must not appear")
    // random graphs, both orientations + duplicates
    val rnd = new scala.util.Random(97)
    for ((n, m) <- Seq((20, 30), (30, 45), (15, 60))) {
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val doubled = edges ++ edges.map(e => (e._2, e._1))
      assert(got(doubled) == ref(edges), s"diverged on n=$n m=$m")
    }
  }
}
