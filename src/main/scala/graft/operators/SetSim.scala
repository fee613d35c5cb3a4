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

  /** (doc_id, toks, rep_id, grp_n): every doc keyed to the min doc_id of
    * its identical-token-set group. A window over the token-array key —
    * ONE shuffle, no array-equality join (grouping + joining back on a
    * variable-length array key costs 2 shuffles and serialized array
    * comparisons; the window computes both aggregates in-partition). */
  def withReps(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("toks"))
    tokenSets(s, d)
      .withColumn("rep_id", min(col("doc_id")).over(w))
      .withColumn("grp_n", count(lit(1)).over(w))
  }

  /** Exact set-similarity self-join over representatives: all pairs of
    * DISTINCT token sets with Jaccard ≥ 0.9, found via rarest-first prefix
    * filtering and verified with integer set arithmetic
    * (ThreshDen·|A∩B| ≥ ThreshNum·|A∪B| — bit-exact on any engine). */
  def qDedupSsjoin(s: SparkSession, d: String): DataFrame =
    ssjoinOnReps(withReps(s, d))

  /** Scale-safe GLOBAL dense rank of the vocabulary, rarest-first:
    * (tok, tid) with tid = row index of the (tok_freq, tok) sort. The sort
    * is range-partitioned and zipWithIndex adds per-partition offsets —
    * never a single-partition window, never a driver collect. Everything
    * downstream of the one tokens⋈vocab join then shuffles dense int ids
    * instead of strings: prefix join keys, positional sort, and the verify
    * intersections all move/compare longs. (Distinct from the REJECTED
    * xxhash64 key experiment: ids here are dense and order-preserving, so
    * the rarest-first prefix semantics are unchanged, and the savings are
    * in every downstream shuffle/compare, not just the join hash.) */
  private def tokenIds(freq: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = freq.sparkSession
    val rdd = freq.sort(col("tok_freq"), col("tok")).select(col("tok")).rdd
      .zipWithIndex
      .map { case (r, i) => org.apache.spark.sql.Row(r.getString(0), i) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("tok", StringType), StructField("tid", LongType))))
  }

  /** Per-doc rarest-first INT token arrays: (doc_id, otoks sorted by tid,
    * sz, plen). tid order == (freq, tok) order, so prefixes are identical
    * to the string formulation — lossless. */
  private def intSets(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(vocab, "tok")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("tid"))).as("otoks"))
      .withColumn("sz", size(col("otoks")))
      // prefix length: |A| - ceil(t*|A|) + 1
      .withColumn("plen",
        col("sz") - floor((col("sz") * ThreshNum + (ThreshDen - 1)) / ThreshDen) + 1)

  /** The ssjoin core over a precomputed (doc_id, toks, rep_id) frame —
    * lets qDedupClusters share ONE withReps computation instead of
    * tokenizing + grouping the corpus twice. */
  private[operators] def ssjoinOnReps(wr: DataFrame): DataFrame = {
    val reps = wr
      .filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("toks"))
      .localCheckpoint() // reused by freq and the int-encode join

    // global token frequencies over rep sets → rarest-first total order.
    // Corpus-scaled → shuffle joins only (AQE may still broadcast freq if
    // the vocabulary is genuinely small).
    val freq = reps.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tok_freq"))

    // encode once; prefix and verify both run on int arrays
    val itoks = intSets(reps, tokenIds(freq))
      .localCheckpoint() // reused: prefix source + both verify sides

    val prefix = itoks
      .select(col("doc_id"), col("sz"),
        posexplode(col("otoks")).as(Seq("pos", "tid")))
      .filter(col("pos") < col("plen"))
      .select(col("tid"), col("pos"), col("doc_id"), col("sz"))
      .localCheckpoint() // reused: token-frequency scan + both join sides

    // Hot-key de-skew: a frequent prefix token would otherwise send every
    // pair it generates into ONE task (tok is the only join key). Split the
    // left side of hot tokens across Salts buckets by doc hash and
    // replicate the right side to every bucket — each (a,b) pair still
    // meets exactly once (at a's salt), so the candidate set is unchanged,
    // but a hot token's pair generation runs as Salts parallel tasks.
    val Salts = 16
    val HotCut = 256L // prefix entries per token before the token is "hot"
    val pfreq = prefix.groupBy(col("tid")).agg(count(lit(1)).as("pf"))
    val ptagged = prefix.join(pfreq, "tid").withColumn("hot", col("pf") >= HotCut)
    val left = ptagged.select(col("tid"),
      when(col("hot"), pmod(xxhash64(col("doc_id")), lit(Salts)).cast("int"))
        .otherwise(lit(0)).as("salt"),
      col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("pos").as("pos_a"))
    val right = ptagged.select(col("tid"),
      explode(when(col("hot"), sequence(lit(0), lit(Salts - 1)))
        .otherwise(array(lit(0)))).as("salt"),
      col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("pos").as("pos_b"))

    // Candidate pairs share a prefix token; two lossless prunes:
    //  - length filter: J >= t ⇒ t*max(|A|,|B|) <= min(|A|,|B|);
    //  - PPJoin positional filter: with both arrays in the same rarest-first
    //    total order, min(pos_a)/min(pos_b) over a pair's matches are the
    //    positions (i,j) of the pair's SMALLEST common token — no common
    //    token precedes it (it would be in both prefixes and thus matched),
    //    so overlap <= 1 + min(|A|-i-1, |B|-j-1); require that bound to
    //    clear the overlap threshold inter*(Num+Den) >= Num*(|A|+|B|).
    val cands = left.join(right, Seq("tid", "salt"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(greatest(col("sz_a"), col("sz_b")) * ThreshNum
        <= least(col("sz_a"), col("sz_b")) * ThreshDen)
      // row-level SINGLE-SIDED positional prefilter before the pair
      // shuffle — lossless: for a pair surviving the two-sided post-group
      // filter, least(sza−i−1, …) ≤ sza−i−1 means its min-pos_a row
      // passes the a-side bound (and the min-pos_b row the b-side), so
      // both per-coordinate minima survive and the post-group filter is
      // computed on the same (i, j). Rows deep in BOTH prefixes drop
      // before they shuffle into the groupBy.
      .filter(((lit(1) + col("sz_a") - col("pos_a") - 1) * (ThreshNum + ThreshDen)
          >= (col("sz_a") + col("sz_b")) * ThreshNum)
        || ((lit(1) + col("sz_b") - col("pos_b") - 1) * (ThreshNum + ThreshDen)
          >= (col("sz_a") + col("sz_b")) * ThreshNum))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("pos_a")).as("i"), min(col("pos_b")).as("j"),
        first(col("sz_a")).as("sza"), first(col("sz_b")).as("szb"))
      .filter((lit(1) + least(col("sza") - col("i") - 1, col("szb") - col("j") - 1))
        * (ThreshNum + ThreshDen) >= (col("sza") + col("szb")) * ThreshNum)
      .select(col("doc_a"), col("doc_b"))

    // verify candidates exactly on the INT arrays (bijective re-encode of
    // the token sets: same intersection/union cardinalities, long compares
    // instead of string compares; shuffle joins on doc ids — both sides
    // corpus-scaled, no broadcast hints)
    val ta = itoks.select(col("doc_id").as("doc_a"), col("otoks").as("toks_a"))
    val tb = itoks.select(col("doc_id").as("doc_b"), col("otoks").as("toks_b"))
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

  /** INCREMENTAL dedup — the production daily-increment pattern: a NEW
    * batch of documents (doc_id ≡ 0 mod 5 as the deterministic stand-in)
    * deduped against the HISTORICAL corpus (the rest), emitting one
    * decision per new doc that matches history: (doc_id, dup_of = the
    * smallest historical doc with Jaccard ≥ 0.9).
    *
    * Scale shape: BOTH relations collapse to identical-set representatives
    * (window min — dup-heavy batches cost O(cluster); a new-rep's matches
    * are exactly its members' matches since the sets are identical, and
    * matching the min hist rep equals matching the min historical doc);
    * candidates come from the same rarest-first PREFIX FILTER as the
    * self-join applied R-S (a qualifying pair must share a token in both
    * prefixes under any shared total order) with the positional filter and
    * hot-token salting (salt the new side, replicate the hist side) — the
    * new batch never cross-joins history and no token serializes a task.
    * Verification is exact integer set arithmetic; decisions rejoin to new
    * members through the rep map at the end. */
  def qDedupIncremental(s: SparkSession, d: String): DataFrame = {
    val isNew = pmod(col("doc_id"), lit(5)) === 0
    dedupNewVsHistory(tokenSets(s, d)
      .withColumn("side", when(isNew, lit("n")).otherwise(lit("h"))))
  }

  /** The new-vs-history core over a combined (doc_id, toks, side) frame
    * (side = "n" for the new batch, "h" for history) — reused by the
    * streaming ingest+dedup loop (graft.streaming.DedupLoop), where the
    * sides come from ledger snapshots instead of a modular split. */
  private[graft] def dedupNewVsHistory(t0: DataFrame): DataFrame = {
    val t = t0
      // rep per (side, token set): collapse dups WITHIN each relation
      .withColumn("rep_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("side"), col("toks"))))
      .localCheckpoint() // reused: rep relations + member expansion
    val histReps = t.filter(col("side") === "h" && col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("toks"))
    val newReps = t.filter(col("side") === "n" && col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("toks"))

    // shared rarest-first total order from the union of both rep relations,
    // as dense int ids (see tokenIds) — prefix/verify shuffles move longs
    val freq = histReps.select(explode(col("toks")).as("tok"))
      .union(newReps.select(explode(col("toks")).as("tok")))
      .groupBy(col("tok")).agg(count(lit(1)).as("tok_freq"))
    val vocab = tokenIds(freq).localCheckpoint() // reused by both sides
    def prefixOf(its: DataFrame): DataFrame =
      its.select(col("doc_id"), col("sz"),
          posexplode(col("otoks")).as(Seq("pos", "tid")))
        .filter(col("pos") < col("plen"))
        .select(col("tid"), col("pos"), col("doc_id"), col("sz"))

    // hot-token de-skew, R-S form: salt the new side by doc hash, replicate
    // the hist side across salts (see ssjoinOnReps for the rationale)
    val Salts = 16
    val HotCut = 256L
    val itN = intSets(newReps, vocab).localCheckpoint()  // prefix + verify
    val itH = intSets(histReps, vocab).localCheckpoint() // prefix + verify
    val pn = prefixOf(itN)
    val ph = prefixOf(itH)
    val pfreq = pn.union(ph).groupBy(col("tid")).agg(count(lit(1)).as("pf"))
    val left = pn.join(pfreq, "tid")
      .select(col("tid"),
        when(col("pf") >= HotCut, pmod(xxhash64(col("doc_id")), lit(Salts)).cast("int"))
          .otherwise(lit(0)).as("salt"),
        col("doc_id").as("new_id"), col("sz").as("sz_n"), col("pos").as("pos_n"))
    val right = ph.join(pfreq, "tid")
      .select(col("tid"),
        explode(when(col("pf") >= HotCut, sequence(lit(0), lit(Salts - 1)))
          .otherwise(array(lit(0)))).as("salt"),
        col("doc_id").as("hist_id"), col("sz").as("sz_h"), col("pos").as("pos_h"))

    // length filter + PPJoin positional filter (see ssjoinOnReps: min
    // matched positions identify the pair's smallest common token)
    val cands = left.join(right, Seq("tid", "salt"))
      .filter(greatest(col("sz_n"), col("sz_h")) * ThreshNum
        <= least(col("sz_n"), col("sz_h")) * ThreshDen)
      // single-sided positional prefilter (lossless — see ssjoinOnReps)
      .filter(((lit(1) + col("sz_n") - col("pos_n") - 1) * (ThreshNum + ThreshDen)
          >= (col("sz_n") + col("sz_h")) * ThreshNum)
        || ((lit(1) + col("sz_h") - col("pos_h") - 1) * (ThreshNum + ThreshDen)
          >= (col("sz_n") + col("sz_h")) * ThreshNum))
      .groupBy(col("new_id"), col("hist_id"))
      .agg(min(col("pos_n")).as("i"), min(col("pos_h")).as("j"),
        first(col("sz_n")).as("szn"), first(col("sz_h")).as("szh"))
      .filter((lit(1) + least(col("szn") - col("i") - 1, col("szh") - col("j") - 1))
        * (ThreshNum + ThreshDen) >= (col("szn") + col("szh")) * ThreshNum)
      .select(col("new_id"), col("hist_id"))

    val repDecisions = cands
      .join(itN.select(col("doc_id").as("new_id"), col("otoks").as("toks_n")), "new_id")
      .join(itH.select(col("doc_id").as("hist_id"), col("otoks").as("toks_h")), "hist_id")
      .withColumn("inter_n", size(array_intersect(col("toks_n"), col("toks_h"))))
      .withColumn("union_n", size(col("toks_n")) + size(col("toks_h")) - col("inter_n"))
      .filter(col("inter_n") * ThreshDen >= col("union_n") * ThreshNum)
      .groupBy(col("new_id"))
      .agg(min(col("hist_id")).as("dup_of"))

    // expand rep decisions to every member of the new batch
    t.filter(col("side") === "n")
      .select(col("doc_id"), col("rep_id").as("new_id"))
      .join(repDecisions, "new_id")
      .select(col("doc_id"), col("dup_of"))
  }

  def qDedupIncrementalSql: String =
    """WITH t AS (SELECT doc_id, list_sort(list_distinct(regexp_split_to_array(trim(text), ' +'))) AS toks FROM documents),
      |hist AS (SELECT doc_id, toks FROM t WHERE doc_id % 5 <> 0),
      |nw AS (SELECT doc_id, toks FROM t WHERE doc_id % 5 = 0)
      |SELECT n.doc_id, min(h.doc_id) AS dup_of
      |FROM nw n JOIN hist h
      |  ON 10 * len(list_intersect(n.toks, h.toks))
      |  >= 9 * (len(n.toks) + len(h.toks) - len(list_intersect(n.toks, h.toks)))
      |GROUP BY n.doc_id""".stripMargin

  /** Transitive dup clusters, fully deterministic and oracle-checked:
    * components of (identical-token-set membership ∪ ssjoin pairs). Output
    * is one row per doc that has at least one duplicate relation:
    * (doc_id, cluster_id = min doc_id of its transitive component).
    * Members inherit their representative's component label directly (a
    * member's rep IS the min of its exact group, so component minima are
    * always rep ids — no need to run CC over member edges). */
  def qDedupClusters(s: SparkSession, d: String): DataFrame = {
    val wrFull = withReps(s, d).localCheckpoint() // one tokenize+group pass
    val wr = wrFull.select(col("doc_id"), col("rep_id"), col("grp_n"))
    // materialize the ssjoin once: connectedComponents reads its edge input
    // twice (forward + flipped) and would otherwise re-execute the whole
    // prefix-filter join per read
    val repEdges = ssjoinOnReps(wrFull).select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val repLabels = Graph.connectedComponents(repEdges, "doc_a", "doc_b") // (node, cluster_id)

    wr.filter(col("grp_n") >= 2 || col("doc_id") =!= col("rep_id")) // dup-group docs
      .join(repLabels.withColumnRenamed("node", "rep_id"), Seq("rep_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"))
      .union( // reps whose only relation is an ssjoin edge (group size 1)
        wr.filter(col("grp_n") === 1 && col("doc_id") === col("rep_id"))
          .join(repLabels.withColumnRenamed("node", "doc_id"), "doc_id")
          .select(col("doc_id"), col("cluster_id")))
  }

  /** PAGERANK over the near-dup similarity graph ([rows]) — the
    * centrality read of the dedup pipeline: within a duplicate cluster
    * the highest-ranked member is the natural CANONICAL representative
    * (well-connected to many near-copies), and across the corpus rank
    * weights sources by how much near-duplicated mass points at them.
    * Edges = the exact ssjoin rep pairs, fed in both directions
    * (undirected); 8 fixed rounds under the Graph loop discipline.
    * Fixture (tokenize + ssjoin) vs operator (the rounds) are
    * bench-phase-split. Ranks are floats (summation order
    * engine-specific) → rows-only driver check; GraphPropertySpec pins
    * the semantics against a driver-computed reference. */
  def qDocPagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = graft.BenchPhase("fixture") {
      ssjoinOnReps(withReps(s, d).localCheckpoint())
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
    }
    graft.BenchPhase("op") {
      val und = pairs.union(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      Graph.pageRank(und, "doc_a", "doc_b", iterations = 8)
        .orderBy(col("rank").desc, col("node"))
    }
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
