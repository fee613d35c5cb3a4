package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.E continued — PRODUCT QUANTIZATION (PQ) similarity search, the
  * compression tier past [[Similarity]]'s scalar int8: the 64-dim vector
  * splits into `PqM`=8 subspaces of 8 dims, each subspace gets its own
  * k-means codebook (`PqK`=32 centroids), and a vector is stored as 8
  * TINYINT code indices — 8 bytes against 256 bytes of float32, a 32×
  * bandwidth cut where scalar quantization gives 4×. The price is a
  * coarser lattice, which the bounded full-precision re-rank pays back.
  *
  * Scoring is ASYMMETRIC DISTANCE COMPUTATION (ADC), the standard PQ read
  * path: the probe stays full-precision and its dot product against every
  * centroid of every codebook is tabulated ONCE per query (PqM·PqK = 256
  * doubles — broadcast-sized), so scoring a corpus row is `PqM` lookups
  * and adds, never a 64-dim multiply. The whole path is Spark-first:
  *   - the LUT assembles IN-PLAN (codebooks ⋈ broadcast probe →
  *     sort_array(collect_list) → nested-array reshape) — one tiny job,
  *     no driver-side collect in the query path, no UDF anywhere;
  *   - the corpus pass reads ONLY `pq_codes` (the codes parquet carries
  *     nothing wider to even prune) and scores via zip_with/element_at —
  *     codegen'd lookups against the broadcast LUT row;
  *   - centroid norms are probe-independent, so `cnorm2` is computed at
  *     BUILD time and persisted in the codebook (the LUT job reshapes it,
  *     never recomputes it).
  * Approximate cosine of a row = Σ_s pdot[s][code_s] /
  * (√(Σ_s cnorm2[s][code_s]) · ‖probe‖) — exactly the cosine of the
  * probe with the row's reconstruction (concatenated centroids).
  *
  * The index is a persisted content-fingerprinted artifact like the IVF
  * index (build cost paid once, never per probe); the k-means fits are
  * deterministic (fixed seeds). Codes are assigned in ONE narrow pass via
  * an in-plan argmin over the centroid literals — not PqM model.transform
  * passes. Engine-specific by design (k-means) → rows-only driver check;
  * PqSpec measures recall vs exact brute force and asserts the codes-only
  * scan. */
object Pq {

  val PqM = 8
  val PqK = 32
  val Dim = 64
  val SubDim: Int = Dim / PqM
  /** Candidate-list bound before exact re-rank (Similarity.CandK's role). */
  val CandK = 60

  private val pqIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Fit the PqM sub-codebooks and persist the index:
    * `codebooks` (sub_id, code_id, centroid, cnorm2 — PqM·PqK rows) and
    * `codes` (vec_id, pq_codes array<tinyint> — the compressed corpus). */
  def buildPqIndex(s: SparkSession, d: String, indexDir: String): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = Similarity.emb(s, d)
    // one small k-means per subspace on its 8-dim slice; 5 Lloyd
    // iterations — PQ recall comes from the re-rank, not centroid polish
    val books: Seq[(Int, Int, Seq[Double])] = (0 until PqM).flatMap { sub =>
      val feats = e.select(array_to_vector(
        slice(col("vec"), sub * SubDim + 1, SubDim)).as("features"))
      val model = new KMeans().setK(PqK).setSeed(42L + sub).setMaxIter(5)
        .setFeaturesCol("features").fit(feats)
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (sub, i, c.toArray.toSeq)
      }
    }
    import s.implicits._
    books.toDF("sub_id", "code_id", "centroid")
      .withColumn("cnorm2",
        aggregate(transform(col("centroid"), x => x * x), lit(0.0), _ + _))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
    // encode in ONE narrow pass: per-sub argmin over the centroid literals
    // (PqK-element array literal per sub — plan-side constants). Sub-slices
    // materialize via withColumn first (the CLAUDE.md lambda rule: an
    // expression referenced inside transform re-executes per element).
    var enc = e.select(col("vec_id"), col("vec"))
    for (sub <- 0 until PqM)
      enc = enc.withColumn(s"_s$sub", slice(col("vec"), sub * SubDim + 1, SubDim))
    val codeCols = (0 until PqM).map { sub =>
      val cents = array(books.filter(_._1 == sub).sortBy(_._2)
        .map(t => array(t._3.map(lit): _*)): _*)
      val dists = transform(cents, c =>
        aggregate(zip_with(c, col(s"_s$sub"), (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _))
      // first-match argmin: deterministic under ties
      (array_position(dists, array_min(dists)) - 1).cast("tinyint")
    }
    enc.select(col("vec_id"), array(codeCols: _*).as("pq_codes"))
      .write.mode("overwrite").parquet(s"$indexDir/codes")
  }

  /** Index dir for a dataset, built at most once per content fingerprint
    * (the Similarity.ivfIndexDir discipline). */
  def pqIndexDir(s: SparkSession, d: String): String = {
    val fp = Similarity.embFingerprint(d)
    pqIndexDirs.computeIfAbsent(fp, { _ =>
      val idx = sys.props("java.io.tmpdir") + s"/graft_pq_$fp"
      if (!new java.io.File(s"$idx/codes/_SUCCESS").exists()
          || !new java.io.File(s"$idx/codebooks/_SUCCESS").exists())
        buildPqIndex(s, d, idx)
      idx
    })
  }

  /** The probe's ADC lookup tables as ONE broadcastable row:
    * `pdot_lut[sub][code]` (probe·centroid), `cn_lut[sub][code]`
    * (persisted centroid norm², reshaped), `probe_nrm`. Assembled in-plan
    * from the PqM·PqK-row codebook — sort_array orders the collected
    * structs by (sub_id, code_id), so flat index = sub·PqK + code. */
  private def adcLut(s: SparkSession, idx: String, probe: DataFrame): DataFrame =
    s.read.parquet(s"$idx/codebooks")
      .crossJoin(broadcast(probe))
      .withColumn("psub",
        slice(col("probe_vec"), col("sub_id") * SubDim + 1, lit(SubDim)))
      .select(col("sub_id"), col("code_id"), col("probe_nrm"),
        Similarity.dot(col("centroid"), col("psub")).as("pdot"), col("cnorm2"))
      .agg(
        sort_array(collect_list(struct(col("sub_id"), col("code_id"),
          col("pdot"), col("cnorm2")))).as("flat"),
        max(col("probe_nrm")).as("probe_nrm"))
      .select(
        transform(sequence(lit(0), lit(PqM - 1)), sub =>
          transform(sequence(lit(0), lit(PqK - 1)), c =>
            element_at(col("flat"), (sub * PqK + c + 1).cast("int"))
              .getField("pdot"))).as("pdot_lut"),
        transform(sequence(lit(0), lit(PqM - 1)), sub =>
          transform(sequence(lit(0), lit(PqK - 1)), c =>
            element_at(col("flat"), (sub * PqK + c + 1).cast("int"))
              .getField("cnorm2"))).as("cn_lut"),
        col("probe_nrm"))

  /** Σ_s lut[s][code_s] — the ADC accumulation: PqM codegen'd lookups. */
  private def adcSum(codes: Column, lut: Column): Column =
    aggregate(zip_with(codes, lut,
      (c, l) => element_at(l, c.cast("int") + 1)), lit(0.0), _ + _)

  /** PQ ANN (probe vec_id=0): LUT job → codes-only ADC scan → top-CandK →
    * exact full-precision re-rank of the bounded candidate list. The
    * corpus pass moves 8 bytes per row. Rows-only check; PqSpec bounds
    * recall vs brute force and proves shared neighbors rank exactly. */
  def qAnnPq(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = pqIndexDir(s, d)
    val e = Similarity.emb(s, d)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("vec").as("probe_vec"),
        Similarity.norm(col("vec")).as("probe_nrm"))
    val lut = adcLut(s, idx, probe)
    val cands = s.read.parquet(s"$idx/codes")
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(lut))
      .select(col("vec_id"),
        (adcSum(col("pq_codes"), col("pdot_lut"))
          / (sqrt(adcSum(col("pq_codes"), col("cn_lut"))) * col("probe_nrm")))
          .as("qcos"))
      .orderBy(col("qcos").desc, col("vec_id"))
      .limit(CandK)
      .select(col("vec_id"))
    e.join(cands, "vec_id")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        (Similarity.dot(col("vec"), col("probe_vec"))
          / (Similarity.norm(col("vec")) * col("probe_nrm"))).as("cos"))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("vec_id"), col("label"))
  }

  /** BATCHED PQ ANN — the one-scan shape: per-probe LUTs (B rows,
    * broadcast) join ONE codes-only corpus pass scoring all probes per
    * row; per-probe top-CandK on the ADC cosine; exact re-rank fetches
    * full precision once per surviving (probe, candidate) pair. B probes
    * cost one 32×-compressed scan — never B scans. */
  def qAnnPqBatch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = pqIndexDir(s, d)
    val e = Similarity.emb(s, d)
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("vec").as("probe_vec"),
        Similarity.norm(col("vec")).as("probe_nrm"))
    val luts = s.read.parquet(s"$idx/codebooks")
      .crossJoin(broadcast(probes))
      .withColumn("psub",
        slice(col("probe_vec"), col("sub_id") * SubDim + 1, lit(SubDim)))
      .select(col("probe_id"), col("sub_id"), col("code_id"), col("probe_nrm"),
        Similarity.dot(col("centroid"), col("psub")).as("pdot"), col("cnorm2"))
      .groupBy(col("probe_id"))
      .agg(
        sort_array(collect_list(struct(col("sub_id"), col("code_id"),
          col("pdot"), col("cnorm2")))).as("flat"),
        max(col("probe_nrm")).as("probe_nrm"))
      .select(col("probe_id"),
        transform(sequence(lit(0), lit(PqM - 1)), sub =>
          transform(sequence(lit(0), lit(PqK - 1)), c =>
            element_at(col("flat"), (sub * PqK + c + 1).cast("int"))
              .getField("pdot"))).as("pdot_lut"),
        transform(sequence(lit(0), lit(PqM - 1)), sub =>
          transform(sequence(lit(0), lit(PqK - 1)), c =>
            element_at(col("flat"), (sub * PqK + c + 1).cast("int"))
              .getField("cnorm2"))).as("cn_lut"),
        col("probe_nrm"))
    // candidate cut via the two-phase bounded heap: the scored relation is
    // corpus×B rows — a per-probe row_number window would shuffle ALL of
    // it into B single-task sorts; the partial pass instead reduces every
    // scan partition to ≤ B·CandK rows before any exchange
    val scored = s.read.parquet(s"$idx/codes")
      .filter(col("vec_id") >= 5)
      .crossJoin(broadcast(luts))
      .select(col("probe_id"), col("vec_id"),
        (adcSum(col("pq_codes"), col("pdot_lut"))
          / (sqrt(adcSum(col("pq_codes"), col("cn_lut"))) * col("probe_nrm")))
          .as("qcos"))
    val cands = graft.plans.TopKPerGroup.twoPhase(
        scored, CandK, "probe_id", "qcos", "vec_id")
      .select(col("probe_id"), col("vec_id"))
    cands.join(e, "vec_id")
      .join(broadcast(probes), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        (Similarity.dot(col("vec"), col("probe_vec"))
          / (Similarity.norm(col("vec")) * col("probe_nrm"))).as("cos"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("rank"), col("vec_id"))
  }
}
