package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.D — EXACT set-similarity self-join + transitive dup clusters, both
  * DuckDB-oracle-checked (the hash-green complement to the approximate
  * MinHash/SimHash decision paths).
  *
  * Scale shape:
  *  1. identical-token-set groups collapse to a representative (groupBy on
  *     the normalized token array — one shuffle), so a huge exact-dup
  *     cluster contributes ONE node to the pair join, not O(cluster²) pairs;
  *  2. representative pairs come from PREFIX FILTERING (PPJoin-family): with
  *     tokens globally ordered rarest-first, two sets with Jaccard ≥ t MUST
  *     share a token among their first |A| − ⌈t·|A|⌉ + 1 tokens — so the
  *     candidate join is an equi-join on prefix tokens, not a cross join.
  *     Lossless: every qualifying pair is a candidate, so the verified
  *     output is EXACTLY the brute-force pair set (what the oracle checks).
  *     A length filter (⌈t·|A|⌉ ≤ |B|) prunes candidates further — also
  *     lossless. Worst case (tiny vocabulary, everything similar) degrades
  *     toward all-pairs — that's inherent to EXACT ssjoin; the approximate
  *     minhash path stays the default at 100 TB, this is the exact tool for
  *     the high-threshold tail.
  *  3. clusters = connected components over the verified rep pairs
  *     (Graph.connectedComponents — min-neighbor contraction + pointer
  *     jumping), members inherit their representative's cluster.
  */
object SetSim {

  /** Jaccard threshold as an exact rational (no float compare anywhere):
    * keep pairs with inter/union ≥ ThreshNum/ThreshDen = 0.9. */
  val ThreshNum = 9
  val ThreshDen = 10

  /** Per-doc normalized token set: distinct tokens, lexicographically
    * sorted (so identical SETS group identically regardless of document
    * order — mirrored by DuckDB list_sort(list_distinct(...))). */
  def tokenSets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_sort(array_distinct(TextOps.tokens(col("text")))).as("toks"))

  /** (doc_id, toks, rep_id): every doc keyed to the min doc_id of its
    * identical-token-set group. One shuffle on the token array. */
  def withReps(s: SparkSession, d: String): DataFrame = {
    val t = tokenSets(s, d)
    val groups = t.groupBy(col("toks")).agg(min(col("doc_id")).as("rep_id"),
      count(lit(1)).as("grp_n"))
    t.join(groups, "toks")
  }

  /** Exact set-similarity self-join over representatives: all pairs of
    * DISTINCT token sets with Jaccard ≥ 0.9, found via rarest-first prefix
    * filtering and verified with integer set arithmetic
    * (ThreshDen·|A∩B| ≥ ThreshNum·|A∪B| — bit-exact on any engine). */
  def qDedupSsjoin(s: SparkSession, d: String): DataFrame = {
    val reps = withReps(s, d)
      .filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("toks"))
      .localCheckpoint() // reused by freq, prefix and verify branches

    // global token frequencies over rep sets → rarest-first total order.
    // Corpus-scaled → shuffle joins only (AQE may still broadcast freq if
    // the vocabulary is genuinely small).
    val freq = reps.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tok_freq"))

    // re-order each rep's tokens rarest-first ((freq, tok) sort is a total
    // order, which is all prefix filtering needs)
    val ordered = reps.select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("tok_freq"), col("tok")))).as("ft"))
      .select(col("doc_id"),
        expr("transform(ft, x -> x.tok)").as("otoks"))
      .withColumn("sz", size(col("otoks")))
      // prefix length: |A| - ceil(t*|A|) + 1
      .withColumn("plen",
        col("sz") - floor((col("sz") * ThreshNum + (ThreshDen - 1)) / ThreshDen) + 1)

    val prefix = ordered
      .select(col("doc_id"), col("sz"),
        posexplode(col("otoks")).as(Seq("pos", "tok")))
      .filter(col("pos") < col("plen"))
      .select(col("tok"), col("doc_id"), col("sz"))

    // candidate pairs share a prefix token; length filter is lossless:
    // J >= t ⇒ t*max(|A|,|B|) <= min(|A|,|B|)
    val cands = prefix.select(col("tok"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
      .join(prefix.select(col("tok"), col("doc_id").as("doc_b"), col("sz").as("sz_b")), "tok")
      .filter(col("doc_a") < col("doc_b"))
      .filter(greatest(col("sz_a"), col("sz_b")) * ThreshNum
        <= least(col("sz_a"), col("sz_b")) * ThreshDen)
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    // verify candidates exactly (shuffle joins on doc ids — both sides
    // corpus-scaled, no broadcast hints)
    val ta = reps.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val tb = reps.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    cands.join(ta, "doc_a").join(tb, "doc_b")
      .withColumn("inter_n", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("union_n", size(col("toks_a")) + size(col("toks_b")) - col("inter_n"))
      .filter(col("inter_n") * ThreshDen >= col("union_n") * ThreshNum)
      .select(col("doc_a"), col("doc_b"), col("inter_n"), col("union_n"))
  }

  def qDedupSsjoinSql: String =
    """WITH t AS (SELECT doc_id, list_sort(list_distinct(regexp_split_to_array(trim(text), ' +'))) AS toks FROM documents),
      |reps AS (SELECT min(doc_id) AS doc_id, any_value(toks) AS toks FROM t GROUP BY toks::VARCHAR)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      | CAST(len(list_intersect(a.toks, b.toks)) AS INT) AS inter_n,
      | CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS INT) AS union_n
      |FROM reps a JOIN reps b ON a.doc_id < b.doc_id
      |WHERE 10 * len(list_intersect(a.toks, b.toks))
      |   >= 9 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))""".stripMargin

  /** Transitive dup clusters, fully deterministic and oracle-checked:
    * components of (identical-token-set membership ∪ ssjoin pairs). Output
    * is one row per doc that has at least one duplicate relation:
    * (doc_id, cluster_id = min doc_id of its transitive component).
    * Members inherit their representative's component label directly (a
    * member's rep IS the min of its exact group, so component minima are
    * always rep ids — no need to run CC over member edges). */
  def qDedupClusters(s: SparkSession, d: String): DataFrame = {
    val wr = withReps(s, d).select(col("doc_id"), col("rep_id"), col("grp_n"))
      .localCheckpoint()
    val repEdges = qDedupSsjoin(s, d).select(col("doc_a"), col("doc_b"))
    val repLabels = Graph.connectedComponents(repEdges, "doc_a", "doc_b") // (node, cluster_id)

    wr.filter(col("grp_n") >= 2 || col("doc_id") =!= col("rep_id")) // dup-group docs
      .join(repLabels.withColumnRenamed("node", "rep_id"), Seq("rep_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"))
      .union( // reps whose only relation is an ssjoin edge (group size 1)
        wr.filter(col("grp_n") === 1 && col("doc_id") === col("rep_id"))
          .join(repLabels.withColumnRenamed("node", "doc_id"), "doc_id")
          .select(col("doc_id"), col("cluster_id")))
  }

  /** DuckDB mirror: recursive-CTE reachability closure over the undirected
    * rep-pair edges → per-node min label; members join through their rep. */
  def qDedupClustersSql: String =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, list_sort(list_distinct(regexp_split_to_array(trim(text), ' +'))) AS toks FROM documents),
      |grp AS (SELECT doc_id, toks, min(doc_id) OVER (PARTITION BY toks::VARCHAR) AS rep_id,
      |        count(*) OVER (PARTITION BY toks::VARCHAR) AS grp_n FROM t),
      |reps AS (SELECT doc_id, toks FROM grp WHERE doc_id = rep_id),
      |edges AS (SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM reps a JOIN reps b ON a.doc_id < b.doc_id
      |  WHERE 10 * len(list_intersect(a.toks, b.toks))
      |     >= 9 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))),
      |und AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
      |reach(a, b) AS (SELECT a, b FROM und
      |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
      |labels AS (SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
      |SELECT g.doc_id, coalesce(l.cluster_id, g.rep_id) AS cluster_id
      |FROM grp g LEFT JOIN labels l ON g.rep_id = l.node
      |WHERE g.grp_n >= 2 OR g.doc_id <> g.rep_id
      |UNION ALL
      |SELECT g.doc_id, l.cluster_id
      |FROM grp g JOIN labels l ON g.doc_id = l.node
      |WHERE g.grp_n = 1 AND g.doc_id = g.rep_id""".stripMargin
}
