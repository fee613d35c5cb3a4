package graft

import graft.operators.{Nsw, Similarity}
import org.apache.spark.sql.functions._

/** Graph-based ANN (per-IVF-cell navigable small-world graphs): recall
  * vs exact brute force, graph invariants, and build determinism. */
class NswSpec extends GraftSpec {

  private def bruteTop20(probeId: Long): Seq[Long] = {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("vec"))
    val probe = e.filter(col("vec_id") === probeId)
      .select(col("vec").as("pv"))
    e.filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        (Similarity.dot(col("vec"), col("pv"))
          / (Similarity.norm(col("vec"))
            * Similarity.norm(col("pv")))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20).collect().map(_.getLong(0)).toSeq
  }

  /** Exact top-20 RESTRICTED to the probe's routed cells — the IVF
    * routing ceiling: no cell-local search can beat it, and a good graph
    * walk should recover nearly all of it. */
  private def cellBrute20(probeId: Long): Seq[Long] = {
    val ivf = Similarity.ivfIndexDir(spark, sf)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("vec"))
    val probe = e.filter(col("vec_id") === probeId)
      .select(col("vec").as("pv"))
    val routed = spark.read.parquet(s"$ivf/centroids")
      .crossJoin(broadcast(probe))
      .select(col("list_id"),
        aggregate(zip_with(col("centroid"), col("pv"),
          (c, p) => (c - p) * (c - p)), lit(0.0), _ + _).as("dist"))
      .orderBy(col("dist"), col("list_id"))
      .limit(Similarity.IvfNProbe).select(col("list_id"))
    val inCells = spark.read.parquet(s"$ivf/assignments")
      .join(broadcast(routed), Seq("list_id"), "left_semi")
      .select(col("vec_id"))
    e.join(inCells, "vec_id").filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        (Similarity.dot(col("vec"), col("pv"))
          / (Similarity.norm(col("vec"))
            * Similarity.norm(col("pv")))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20).collect().map(_.getLong(0)).toSeq
  }

  test("graph-ANN recall@20: the beam walk recovers the routed cells' " +
      "exact top-20 (the routing ceiling) and clears the IVF family's " +
      "absolute bound vs global brute force; 5 probes x 20 ranked rows") {
    val got = Nsw.qAnnHnsw(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length == 100, s"rows: ${got.length}")
    val byProbe = got.groupBy(_._1)
    assert(byProbe.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // (a) vs the ROUTING CEILING: the graph walk must not lose what the
    // cell restriction kept — this isolates the walk's own quality
    val vsCeiling = (0L to 4L).map { pid =>
      val ceil = cellBrute20(pid).toSet
      val ann = byProbe(pid).map(_._3).toSet
      (ceil & ann).size.toDouble / ceil.size
    }
    val meanCeil = vsCeiling.sum / vsCeiling.size
    assert(vsCeiling.forall(_ >= 0.8),
      s"beam walk lost in-cell neighbors: $vsCeiling")
    assert(meanCeil >= 0.9, s"mean vs routing ceiling $meanCeil < 0.9")
    // (b) vs GLOBAL brute force: bounded by the routing itself (the IVF
    // family's documented regime on these weakly-clustered vectors —
    // qAnnIvfBatch pins mean >= 0.3 at top-5); hold the same class
    val vsGlobal = (0L to 4L).map { pid =>
      val brute = bruteTop20(pid).toSet
      (brute & byProbe(pid).map(_._3).toSet).size.toDouble / brute.size
    }
    val meanGlobal = vsGlobal.sum / vsGlobal.size
    assert(meanGlobal >= 0.35,
      s"mean recall $meanGlobal vs global brute collapsed ($vsGlobal)")
  }

  test("graph invariants: every corpus vector is a node exactly once; " +
      "degrees respect the cap; neighbor lists reference real nodes") {
    val idx = Nsw.nswIndexDir(spark, sf)
    val g = spark.read.parquet(s"$idx/graph")
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(g.count() == n)
    assert(g.select(col("vec_id")).distinct().count() == n)
    val maxDeg = g.select(size(col("nbrs")).as("d"))
      .agg(max(col("d"))).head().getInt(0)
    assert(maxDeg <= Nsw.NswMMax + Nsw.NswM,
      s"degree $maxDeg blew past the cap") // cap enforced at link time;
    // a node's own out-links (<= M) add to capped reciprocal lists
    val dangling = g.select(explode(col("nbrs")).as("nb"))
      .join(g.select(col("vec_id").as("nb")), Seq("nb"), "left_anti")
      .count()
    assert(dangling == 0L, s"$dangling dangling neighbor refs")
    // connectivity proxy: no isolated nodes in any multi-node cell
    val iso = g.filter(size(col("nbrs")) === 0).count()
    val singletonCells = g.groupBy(col("list_id")).count()
      .filter(col("count") === 1).count()
    assert(iso <= singletonCells, s"$iso isolated nodes")
  }

  test("probe graph scan is directory-pruned to the probed cells: the " +
      "list_id-partitioned graph read carries a static IN partition " +
      "filter bounded by B x nProbe cells, never a full index scan") {
    val q = Nsw.qAnnHnsw(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    val graphScan = plan.linesIterator
      .filter(l => l.contains("graft_nsw1") && l.contains("PartitionFilters"))
      .mkString("\n")
    assert(graphScan.nonEmpty,
      s"no partition-filtered scan over the nsw graph dir:\n${plan.take(3000)}")
    val pf = graphScan.split("PartitionFilters: \\[")(1)
    assert(pf.startsWith("list_id") && pf.contains(" INSET "),
      s"graph scan partition filter is not a list_id INSET prune: $pf")
    // files read ∝ probed cells: the INSET list is bounded by B·nProbe
    // (5 probes × IvfNProbe routed cells), independent of the cell count
    val inList = pf.split(" INSET ")(1).takeWhile(_ != ']')
    val nCells = inList.split(",").length
    assert(nCells >= 1 && nCells <= 5 * Similarity.IvfNProbe,
      s"pruned cell set size $nCells outside (0, B*nProbe]: $inList")
  }

  test("build determinism: rebuilding into a fresh dir is byte-identical " +
      "in content (same nodes, same neighbor lists)") {
    val idx = Nsw.nswIndexDir(spark, sf)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_nsw_rebuild").toString
    Nsw.buildNswIndex(spark, sf, tmp)
    val a = spark.read.parquet(s"$idx/graph")
      .select(col("vec_id"), col("nbrs"))
    val b = spark.read.parquet(s"$tmp/graph")
      .select(col("vec_id"), col("nbrs"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "rebuild diverged")
  }
}
