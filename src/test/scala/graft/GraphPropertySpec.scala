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
}
