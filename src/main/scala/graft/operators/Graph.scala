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
    * Algorithm — min-neighbor contraction + pointer jumping:
    *   1. parent(v) = min(v, min neighbor). Every pointer strictly
    *      decreases, so the parent map is a FOREST (acyclic) regardless of
    *      input graph shape;
    *   2. pointer-jump ⌈log₂ n⌉ rounds (grandparent substitution squares
    *      hop distance — enough for any forest over n nodes) → every node
    *      labeled with its tree root;
    *   3. contract: rewrite edges onto root pairs, drop self-loops. If any
    *      edges survive (components spanning multiple trees), repeat on the
    *      contracted graph and compose the label maps.
    *
    * Every surviving node merged with a strictly smaller neighbor, so the
    * contracted graph shrinks geometrically → O(log n) outer rounds. The
    * one per-round action (emptiness check) runs on the SHRINKING
    * contracted edge set — unlike a convergence count over a
    * non-shrinking frame. All joins are shuffle equi-joins on node ids;
    * lineage is truncated per round (localCheckpoint) so plans stay flat.
    */
  def connectedComponents(edges0: DataFrame, src: String, dst: String): DataFrame = {
    var edges = edges0
      .select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .localCheckpoint()
    // labels carried across contraction rounds: (node, label) — label is a
    // node of the CURRENT contracted graph until the loop exits
    var labels = edges.select(col("a").as("node"))
      .union(edges.select(col("b")))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()

    while (!edges.isEmpty) {
      val und = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      // 1. min-neighbor forest
      var parent = und.groupBy(col("a"))
        .agg(min(col("b")).as("min_nbr"))
        .select(col("a").as("node"), least(col("a"), col("min_nbr")).as("par"))
        .localCheckpoint()
      // 2. pointer jumping: ceil(log2 n) grandparent rounds
      val n = parent.count()
      val rounds = math.max(1,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1)))
      var r = 0
      while (r < rounds) {
        val grand = parent.select(col("node").as("g_node"), col("par").as("g_par"))
        parent = parent
          .join(grand, parent("par") === grand("g_node"), "left")
          .select(col("node"), coalesce(col("g_par"), col("par")).as("par"))
          .localCheckpoint()
        r += 1
      }
      // compose: current labels point at nodes of this round's graph
      val roots = parent.select(col("node").as("l_node"), col("par").as("l_root"))
      labels = labels
        .join(roots, labels("label") === roots("l_node"), "left")
        .select(col("node"), coalesce(col("l_root"), col("label")).as("label"))
        .localCheckpoint()
      // 3. contract edges onto roots, drop intra-tree edges
      val ra = roots.select(col("l_node").as("a"), col("l_root").as("ra"))
      val rb = roots.select(col("l_node").as("b"), col("l_root").as("rb"))
      edges = edges.join(ra, "a").join(rb, "b")
        .select(col("ra").as("a"), col("rb").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint()
    }
    labels.select(col("node"), col("label").as("cluster_id"))
  }
}
