package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.E — GRAPH-BASED ANN (the HNSW/NSW family: Malkov & Ponomarenko
  * 2014 navigable small worlds; Malkov & Yashunin 2018 HNSW; Subramanya
  * et al. 2019 DiskANN): a navigable proximity GRAPH searched by greedy
  * beam walk — the highest-recall-per-latency index family in published
  * use, and the one whose pointer-chasing shape does NOT map to a
  * monolithic DataFrame plan. The Spark-shaped form (the r14 verdict's
  * open question, answered here): PARTITION the corpus by IVF cell and
  * keep one independent navigable graph PER CELL — graph construction
  * and search are cell-local `flatMapGroups` (the in-JVM pointer chase
  * runs inside one task over one cell's bounded rows), routing between
  * cells stays the IVF centroid table (broadcast-sized), and the merged
  * candidate lists re-rank exactly like qAnnIvfQuant. At 100 TB the
  * graph table is list_id-partitioned parquet like the inverted lists
  * (a probe reads nProbe cells' graphs, directory-pruned); cells bound
  * memory by construction (corpus growth adds cells, not cell size),
  * and builds parallelize per cell with zero cross-cell traffic.
  *
  * Determinism (no RNG anywhere): nodes insert in vec_id order, every
  * distance tie breaks by id, and the beam structures order (score, id)
  * — two builds of the same corpus are byte-identical, so the index is
  * fingerprint-cacheable like ivf/pq and the recall spec is stable.
  * Flat (single-layer) graphs per cell, not hierarchical: the hierarchy
  * buys O(log n) entry routing on HUGE graphs, while cells here are
  * bounded — the seeded-entry flat walk is the same search regime the
  * published family converges to at this size (DiskANN is also flat).
  *
  * Scored on the persisted int8 codes (dequantized — the 4×-smaller
  * representation the index keeps hot), exact full-precision re-rank on
  * the bounded candidate list only. [rows] gate + NswSpec recall bound
  * vs exact brute force. */
object Nsw {

  /** Links kept per node at insert. */
  val NswM = 8
  /** Degree cap after reciprocal linking (prune keeps the closest). */
  val NswMMax = 16
  /** Beam width during construction. */
  val NswEfBuild = 32
  /** Beam width during search (per probed cell). */
  val NswEfSearch = 48

  private[operators] case class GraphRow(list_id: Int, vec_id: Long,
    nbrs: Seq[Long], codes: Seq[Int])

  /** Greedy beam search over one cell's graph: best-first expansion from
    * `entry`, keeping the `ef` best by cosine; returns (cos, id) best
    * first. Ties order by id — fully deterministic. */
  private[operators] def beamSearch(nbrsOf: Long => Seq[Long],
      cosOf: Long => Double, entry: Long, ef: Int): Seq[(Double, Long)] = {
    import scala.collection.mutable
    val visited = mutable.Set[Long](entry)
    // candidates: best cos first (tie: smaller id); results: worst first
    val cand = mutable.PriorityQueue[(Double, Long)]()(
      Ordering.by[(Double, Long), (Double, Long)](x => (x._1, -x._2)))
    val res = mutable.PriorityQueue[(Double, Long)]()(
      Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, x._2)))
    val c0 = cosOf(entry)
    cand.enqueue((c0, entry)); res.enqueue((c0, entry))
    var done = false
    while (!done && cand.nonEmpty) {
      val (cc, cid) = cand.dequeue()
      if (res.size >= ef && cc < res.head._1) done = true
      else nbrsOf(cid).foreach { nb =>
        if (!visited(nb)) {
          visited += nb
          val cn = cosOf(nb)
          if (res.size < ef || cn > res.head._1
              || (cn == res.head._1 && nb < res.head._2)) {
            cand.enqueue((cn, nb)); res.enqueue((cn, nb))
            if (res.size > ef) { res.dequeue(); () }
          }
        }
      }
    }
    res.toSeq.sortBy(x => (-x._1, x._2))
  }

  private[operators] def dequant(codes: Seq[Int], gmin: Double,
      gmax: Double): Array[Double] = {
    val step = (gmax - gmin) / 255.0
    codes.iterator.map(c => gmin + (c + 0.5) * step).toArray
  }

  private[operators] def l2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private[operators] def dotd(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Build one cell's navigable graph by ordered insertion (the NSW
    * construction): each node beam-searches the graph built so far for
    * its [[NswEfBuild]] nearest, links to the top [[NswM]], reciprocal
    * links cap at [[NswMMax]] with closest-kept pruning. Entry = the
    * first (smallest-id) node. O(n·ef·d) per cell — never n². */
  private[operators] def buildCell(listId: Int,
      nodes: Seq[(Long, Seq[Int])], gmin: Double, gmax: Double)
      : Iterator[GraphRow] = {
    import scala.collection.mutable
    val sorted = nodes.sortBy(_._1)
    val vecs = mutable.Map[Long, Array[Double]]()
    val norms = mutable.Map[Long, Double]()
    sorted.foreach { case (id, codes) =>
      val v = dequant(codes, gmin, gmax)
      vecs(id) = v; norms(id) = math.max(l2(v), 1e-12)
    }
    val adj = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
    val entry = sorted.head._1
    def cosBetween(a: Long, b: Long): Double =
      dotd(vecs(a), vecs(b)) / (norms(a) * norms(b))
    sorted.drop(1).foreach { case (id, _) =>
      val near = beamSearch(
        n => adj.getOrElse(n, mutable.ArrayBuffer.empty[Long]).toSeq,
        cosBetween(_, id), entry, NswEfBuild)
        .filter(_._2 != id)
      val links = near.take(NswM).map(_._2)
      adj(id) = mutable.ArrayBuffer(links: _*)
      links.foreach { l =>
        val lb = adj.getOrElseUpdate(l, mutable.ArrayBuffer.empty)
        if (!lb.contains(id)) lb += id
        if (lb.length > NswMMax) {
          val kept = lb.toSeq.sortBy(n => (-cosBetween(l, n), n))
            .take(NswMMax)
          lb.clear(); lb ++= kept
        }
      }
    }
    sorted.iterator.map { case (id, codes) =>
      GraphRow(listId, id,
        adj.getOrElse(id, mutable.ArrayBuffer.empty).toSeq.sorted, codes)
    }
  }

  /** Fold one cell's CHANGE BATCH into its standing graph (the
    * maintained-index insert/delete discipline — NswDelta): deletes drop
    * the node and purge it from every neighbor list; upserts re-insert
    * via the same beam-link-prune construction the bootstrap used
    * (NSW construction IS incremental insertion — the family's defining
    * property); the entry point is the smallest surviving id. Emits ONLY
    * the changed rows — (list_id, vec_id, nbrs, codes, isDrop) — so the
    * write-back merge stays blast-radius-bounded (the inserted nodes
    * plus their capped link neighborhoods plus delete purges). Insertion
    * order is ascending id — deterministic, but intentionally NOT
    * bit-equal to a from-scratch rebuild of the final corpus: navigable
    * graphs are insertion-order-dependent (published HNSW/DiskANN
    * behavior); the maintained contract is INVARIANTS + recall, pinned
    * by NswDeltaSpec, never byte shape. */
  private[operators] def applyCellChanges(listId: Int,
      existing: Seq[(Long, Seq[Long], Seq[Int])],
      inserts: Seq[(Long, Seq[Int])], deletes: Set[Long],
      gmin: Double, gmax: Double,
      purgeOnly: Set[Long] = Set.empty)
      : Iterator[(Int, Long, Seq[Long], Seq[Int], Boolean)] = {
    import scala.collection.mutable
    val vecs = mutable.Map[Long, Array[Double]]()
    val norms = mutable.Map[Long, Double]()
    val codesOf = mutable.Map[Long, Seq[Int]]()
    val adj = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
    existing.foreach { case (id, nbrs, codes) =>
      val v = dequant(codes, gmin, gmax)
      vecs(id) = v; norms(id) = math.max(l2(v), 1e-12)
      codesOf(id) = codes
      adj(id) = mutable.ArrayBuffer(nbrs: _*)
    }
    val dirty = mutable.Set[Long]()
    def purge(d: Long): Unit = {
      adj.remove(d); vecs.remove(d); norms.remove(d); codesOf.remove(d)
      adj.foreach { case (n, lb) =>
        if (lb.contains(d)) { lb -= d; dirty += n }
      }
    }
    val reallyDeleted = deletes.filter(adj.contains)
    reallyDeleted.foreach(purge)
    // purge-only: the node MOVED to another cell — its row is replaced
    // by the new cell's insert through the same merge, so this cell only
    // cleans its adjacency (no drop row: duplicate merge keys forbidden)
    purgeOnly.filter(adj.contains).foreach(purge)
    def cosTo(a: Long, v: Array[Double], vn: Double): Double =
      dotd(vecs(a), v) / (norms(a) * vn)
    inserts.sortBy(_._1).foreach { case (id, codes) =>
      if (adj.contains(id)) purge(id) // update = re-insert
      val v = dequant(codes, gmin, gmax)
      val vn = math.max(l2(v), 1e-12)
      val links =
        if (adj.isEmpty) Seq.empty[Long]
        else {
          val entry = adj.keysIterator.min
          beamSearch(
            n => adj.getOrElse(n, mutable.ArrayBuffer.empty[Long]).toSeq,
            cosTo(_, v, vn), entry, NswEfBuild)
            .filter(_._2 != id).take(NswM).map(_._2)
        }
      vecs(id) = v; norms(id) = vn; codesOf(id) = codes
      adj(id) = mutable.ArrayBuffer(links: _*)
      dirty += id
      links.foreach { l =>
        val lb = adj(l)
        if (!lb.contains(id)) lb += id
        if (lb.length > NswMMax) {
          val kept = lb.toSeq
            .sortBy(n => (-cosTo(n, vecs(l), norms(l)), n)).take(NswMMax)
          lb.clear(); lb ++= kept
        }
        dirty += l
      }
    }
    reallyDeleted.iterator.map(d =>
      (listId, d, Seq.empty[Long], Seq.empty[Int], true)) ++
      dirty.iterator.filter(adj.contains).map(id =>
        (listId, id, adj(id).toSeq.sorted, codesOf(id), false))
  }

  /** Build the per-cell graphs as a persisted lake artifact next to the
    * IVF index's centroids/quant: `graph` rows (list_id, vec_id, nbrs,
    * codes), list_id-partitioned like the inverted lists. One
    * flatMapGroups pass — each cell builds independently inside one
    * task; memory is cell-bounded. */
  def buildNswIndex(s: SparkSession, d: String, indexDir: String): Unit = {
    import s.implicits._
    val ivf = Similarity.ivfIndexDir(s, d)
    val q = s.read.parquet(s"$ivf/quant").head()
    val (gmin, gmax) = (q.getAs[Double]("gmin"), q.getAs[Double]("gmax"))
    s.read.parquet(s"$ivf/assignments")
      .select(col("list_id").cast("int"), col("vec_id"), col("codes"))
      .as[(Int, Long, Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (listId, it) =>
        buildCell(listId, it.map(r => (r._2, r._3)).toSeq, gmin, gmax)
      }
      .toDF()
      .repartition(col("list_id"))
      .write.partitionBy("list_id").mode("overwrite")
      .parquet(s"$indexDir/graph")
  }

  private val nswIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Index dir per CONTENT fingerprint (the ivf/pq discipline — any
    * layout change needs a new prefix; completion checks the LAST build
    * artifact). */
  def nswIndexDir(s: SparkSession, d: String): String = {
    val fp = Similarity.embFingerprint(d)
    nswIndexDirs.computeIfAbsent(fp, { _ =>
      val idx = sys.props("java.io.tmpdir") + s"/graft_nsw1_$fp"
      if (!new java.io.File(s"$idx/graph/_SUCCESS").exists())
        buildNswIndex(s, d, idx)
      idx
    })
  }

  /** Driver-gate query [rows]: batched graph-ANN — probes (vec_id < 5)
    * route to their [[Similarity.IvfNProbe]] nearest cells off the
    * broadcast centroid table (the qAnnIvfBatch shape), each routed
    * (cell, probe) pair beam-walks that cell's graph in-task
    * (flatMapGroups — the pointer chase never leaves the executor), and
    * the bounded candidate union (≤ B·nProbe·ef rows) re-ranks EXACTLY
    * on full-precision vectors for the final top-20 per probe. The probe
    * batch itself is bounded (B=5) and rides a collected routing map —
    * the MMR-pool discipline, never a corpus-scaled collect. */
  def qAnnHnsw(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val idx = nswIndexDir(s, d)
    val ivf = Similarity.ivfIndexDir(s, d)
    val e = Similarity.emb(s, d)
    val qrow = s.read.parquet(s"$ivf/quant").head()
    val (gmin, gmax) = (qrow.getAs[Double]("gmin"), qrow.getAs[Double]("gmax"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("vec").as("probe_vec"))
    val routed = s.read.parquet(s"$ivf/centroids")
      .crossJoin(broadcast(probes))
      .select(col("probe_id"), col("list_id").cast("int").as("list_id"),
        aggregate(zip_with(col("centroid"), col("probe_vec"),
          (c, p) => (c - p) * (c - p)), lit(0.0), _ + _).as("dist"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("dist"), col("list_id"))))
      .filter(col("rk") <= Similarity.IvfNProbe)
      .select(col("probe_id"), col("list_id"))
    // bounded routing map + probe vectors to the driver (B·nProbe rows)
    val routeMap: Map[Int, Seq[Long]] = routed.collect()
      .map(r => (r.getInt(1), r.getLong(0))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val probeVecs: Map[Long, Array[Double]] = probes.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Number](1).map(_.doubleValue()).toArray).toMap
    // directory-prune the graph read to the PROBED cells (list_id is the
    // parquet partition column; the routing map is already on the driver)
    // — at 100x cell counts a bounded probe batch must never pay a full
    // index scan + shuffle. NswSpec pins files-read ∝ probed cells.
    val candidates = s.read.parquet(s"$idx/graph")
      .filter(col("list_id").isin(routeMap.keys.toSeq: _*))
      .select(col("list_id").cast("int"), col("vec_id"), col("nbrs"),
        col("codes"))
      .as[(Int, Long, Seq[Long], Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (listId, it) =>
        routeMap.get(listId) match {
          case None => Iterator.empty // unprobed cell: skip cheaply
          case Some(pids) =>
            val rows = it.toSeq
            val adj = rows.map(r => r._2 -> r._3).toMap
            val vecs = rows.map(r =>
              r._2 -> dequant(r._4, gmin, gmax)).toMap
            val norms = vecs.map { case (id, v) =>
              id -> math.max(l2(v), 1e-12) }
            val entry = rows.map(_._2).min
            pids.iterator.flatMap { pid =>
              val pv = probeVecs(pid)
              val pn = math.max(l2(pv), 1e-12)
              beamSearch(adj.getOrElse(_, Nil),
                id => dotd(vecs(id), pv) / (norms(id) * pn),
                entry, NswEfSearch)
                .map { case (_, id) => (pid, id) }
            }
        }
      }
      .toDF("probe_id", "vec_id")
    // exact full-precision re-rank of the bounded candidate union
    candidates
      .filter(col("vec_id") =!= col("probe_id"))
      .join(e, "vec_id")
      .join(broadcast(probes), "probe_id")
      .select(col("probe_id"), col("vec_id"), col("label"),
        (Similarity.dot(col("vec"), col("probe_vec"))
          / (Similarity.norm(col("vec"))
            * Similarity.norm(col("probe_vec")))).as("cos"))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 20)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("label"))
      .orderBy(col("probe_id"), col("rank"))
  }
}
