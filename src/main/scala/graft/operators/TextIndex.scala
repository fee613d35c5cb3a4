package graft.operators

import graft.Tables
import graft.sources.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.C — INVERTED TEXT INDEX as a lake artifact: a SERVED keyword-search
  * surface at 100 TB is posting-list intersection, never a `contains()`
  * scan of the text column (qAnnHybrid's predicate scans text — right
  * for one-off filters; a repeated search workload amortizes ONE
  * tokenize pass into an index). Postings are the DISTINCT
  * (token, doc_id) pairs, written CLUSTERED by token and ledgered with
  * min/max stats AND bloom filters on `token` — a query's terms prune
  * posting FILES at the manifest level (the lake-native form of
  * token-sharded posting lists), and the text column is never read at
  * query time. Search is AND-intersection: filter postings to the terms
  * (a pushed In + manifest skipping), count distinct matched terms per
  * doc, keep docs matching all — one shuffle on doc_id, output
  * query-sized. The index is built once per corpus CONTENT fingerprint
  * (the ivfIndexDir discipline — the query path never fits or scans the
  * corpus); a changed corpus gets a fresh index. At scale the same
  * build lands via GraftTable.ingest into a shared lake location, and
  * arrivals maintain it through the change feed like IvfDelta.
  */
object TextIndex {

  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def fingerprint(d: String): String = {
    val root = new java.io.File(s"$d/documents.parquet")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val rootPath = root.getAbsolutePath
    val digest = java.security.MessageDigest.getInstance("MD5")
    digest.update(rootPath.getBytes("UTF-8"))
    walk(root).foreach { f =>
      val rel = f.getAbsolutePath.stripPrefix(rootPath)
      digest.update(s"$rel:${f.length}:${f.lastModified}".getBytes("UTF-8"))
    }
    digest.digest().map("%02x".format(_)).mkString
  }

  /** Build the posting-list lake at `indexRoot`: ONE tokenize pass
    * yields (token, doc_id, tf) postings (term frequency — the ranked
    * retrieval needs it; boolean search ignores it) written
    * token-clustered (range partitioning keeps each token's postings in
    * few files so the stats bounds are tight) and ledgered with stats +
    * blooms on token, plus the per-doc length sidecar `doclens`
    * (doc_id, dl) and a 1-row `corpus` stats file (N, total length) —
    * the BM25 normalization terms, KB-scale. */
  def buildIndex(s: SparkSession, d: String, indexRoot: String): Unit = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "token")))
    // materialize the tokenize ONCE — both the landing write and the
    // doclens rollup read the checkpointed postings, not the lineage.
    // `positions` (sorted in-doc offsets) is the POSITIONAL index the
    // phrase search intersects — tf-only consumers never read it
    // (column pruning drops it at the scan).
    val postings = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .localCheckpoint()
    postings
      .repartitionByRange(8, col("token"))
      .sortWithinPartitions(col("token"))
      .write.mode("overwrite").parquet(s"$indexRoot/landing")
    val doclens = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
      .localCheckpoint()
    doclens.write.mode("overwrite").parquet(s"$indexRoot/doclens")
    doclens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexRoot/corpus")
    GraftTable(s, s"$indexRoot/ledger", s"$indexRoot/gen")
      .ingest(s"$indexRoot/landing",
        statsCols = Seq("token"), bloomCols = Seq("token"))
  }

  /** Index dir for a dataset, built at most once per content. The
    * completion guard checks the LEDGER (the build's LAST artifact —
    * the ivfIndexDir discipline): a crash between the landing write and
    * the ingest must rebuild, never serve an empty index. */
  def indexDir(s: SparkSession, d: String): String = {
    val fp = fingerprint(d)
    dirs.computeIfAbsent(fp, { _ =>
      // "textidx3": the layout now carries POSITIONS (+ tf + doclens +
      // corpus stats) — a new dir name so a pre-positions index on disk
      // can never satisfy the completion check (the ivfq lesson)
      val idx = sys.props("java.io.tmpdir") + s"/graft_textidx3_$fp"
      val ledgered = Option(new java.io.File(s"$idx/ledger").listFiles())
        .exists(_.exists(_.getName.endsWith(".parquet")))
      if (!ledgered) buildIndex(s, d, idx)
      idx
    })
  }

  /** The posting relation (manifest-driven lake read — data skipping on
    * pushed token predicates included). */
  def postings(s: SparkSession, d: String): DataFrame = {
    val idx = indexDir(s, d)
    GraftTable(s, s"$idx/ledger", s"$idx/gen").read()
  }

  /** The AND-intersection body shared by the static and maintained
    * indexes (one copy of the semantics — duplicate terms must not make
    * the query unsatisfiable, hence the distinct). */
  private[operators] def searchPostings(postings: DataFrame,
      terms0: Seq[String]): DataFrame = {
    val terms = terms0.distinct
    require(terms.nonEmpty, "empty search")
    postings
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("token")).as("__n"))
      .filter(col("__n") === terms.size)
      .select(col("doc_id"))
  }

  /** Docs containing ALL of `terms` (exact whitespace-token semantics —
    * the tokenizer the index was built with). */
  def search(s: SparkSession, d: String, terms0: Seq[String]): DataFrame =
    searchPostings(postings(s, d), terms0)

  private[graft] val SearchTerms = Seq("spark", "merge", "window")

  /** PHRASE SEARCH — docs containing `terms` as CONSECUTIVE tokens, the
    * canonical positional-index query (boolean AND can't tell "big
    * order scan" from the words scattered across the doc). Plan: each
    * term's postings prune at the manifest (pushed Equals + blooms),
    * then a doc_id-equi join chain intersects SHIFTED position sets —
    * `array_intersect(positions_so_far + 1, positions_next)` keeps the
    * end offsets of every partial phrase match, all inside codegen'd
    * array expressions (no explode — a posting's position list is
    * tf-bounded). Join count = phrase length − 1, each frame
    * term-posting-sized, never corpus-sized. */
  def searchPhrase(s: SparkSession, d: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty phrase")
    val all = postings(s, d)
    def post(t: String, alias: String) =
      all.filter(col("token") === t)
        .select(col("doc_id"), col("positions").as(alias))
    val first = post(terms.head, "p")
    val chained = terms.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(post(t, s"p_$i"), "doc_id")
          .withColumn("p", array_intersect(
            transform(col("p"), x => x + 1), col(s"p_$i")))
          .filter(size(col("p")) > 0)
          .drop(s"p_$i")
    }
    chained.select(col("doc_id"))
  }

  /** BM25-RANKED search — boolean retrieval's other half: score every
    * doc matching ANY query term by Okapi BM25 (k1=1.2, b=0.75) and
    * return ALL matches with their score. Cross-engine determinism
    * discipline (the q_psi_drift lesson): per-term scores assemble in a
    * FIXED term order as one row-local expression (a Σ over posting
    * ROWS would re-order floating adds), df/N/dl/avgdl are exact
    * integers or exact-ratio doubles, and the final score rounds to
    * 9 dp to absorb the engines' ln() ulp slack — so DuckDB replays the
    * whole ranking exactly. Plan shape: terms prune posting files at
    * the manifest (pushed In), a PIVOT on the bounded term list turns
    * postings into per-term tf columns (one doc_id shuffle), doclens
    * joins on doc_id, corpus stats broadcast as a 1-row cross join. */
  def searchRanked(s: SparkSession, d: String, terms0: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = terms0.distinct
    require(terms.nonEmpty, "empty search")
    val idx = indexDir(s, d)
    // ONE manifest-pruned posting scan feeds both the per-doc tf pivot
    // and the per-term df counts: the pivoted frame is query-sized, so
    // checkpoint it and read df off its non-null column counts (a doc
    // holds a non-null tf_t exactly when it contains t — every doc with
    // any query term is in the frame, so count(t) IS df_t).
    val hits = postings(s, d)
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"))
      .pivot("token", terms)
      .agg(first(col("tf")))
      .localCheckpoint()
    val scored = hits
      .join(s.read.parquet(s"$idx/doclens"), "doc_id")
      .crossJoin(broadcast(s.read.parquet(s"$idx/corpus")))
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      count(col(t)).as(s"df_$i")
    }
    val dfRow = hits.agg(dfCols.head, dfCols.tail: _*)
    val withDf = scored.crossJoin(broadcast(dfRow))
    def termScore(t: String, i: Int) = {
      val tf = coalesce(col(t).cast("double"), lit(0.0))
      val df = coalesce(col(s"df_$i").cast("double"), lit(0.0))
      val idf = log(
        (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5))
          + lit(1.0))
      val avgdl = col("total_dl").cast("double") / col("n_docs").cast("double")
      val norm = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
      when(tf > 0, idf * norm).otherwise(lit(0.0))
    }
    // fixed LEFT-ASSOCIATED term order — both engines add identically
    val score = terms.zipWithIndex.map { case (t, i) => termScore(t, i) }
      .reduce(_ + _)
    withDf.select(col("doc_id"), round(score, 9).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** BOUNDED top-K ranked retrieval — the SERVING form of
    * [[searchRanked]]: a 100 TB corpus meeting a stopword-adjacent term
    * scores a corpus-scaled match set, and a serving path must never
    * globally sort or return that frame. Same scoring plan (manifest-
    * pruned postings → per-doc pivot → BM25), then `sort+limit` — which
    * Spark plans as TakeOrderedAndProject: each partition keeps a
    * BOUNDED K-row heap, the driver merges #partitions × K rows, no
    * global sort ever materializes (TopKSpec pins the plan shape). Ties
    * break on (score DESC, doc_id) so the cut is deterministic and
    * equals head-K of the full ranking. */
  def searchRankedTopK(s: SparkSession, d: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    searchRanked(s, d, terms).limit(k)
  }

  /** WAND-CLASS pruned top-K — [[searchRankedTopK]] with IMPACT-ORDERED
    * candidate pruning, the batch form of document-at-a-time upper-bound
    * retrieval: most ANY-matchers of a common term cannot reach the
    * top-K, and a serving path should never pay their doclens join +
    * scoring. Three bounded phases over the manifest-pruned postings:
    *
    *  1. SEED — exact-score only the docs holding the RAREST query term
    *    (the smallest posting list); the k-th best seed score is a LOWER
    *    bound θ on the final k-th score (top-K over a superset can only
    *    be larger).
    *  2. PRUNE — per-term score upper bound ub_t = idf_t·(k1+1) (BM25's
    *    norm is < k1+1 for any tf/dl); a doc's bound is the sum over its
    *    PRESENT terms, computable from postings alone (one groupBy — no
    *    pivot, no doclens join). Docs with Σub < θ − 1e-9 can never
    *    displace a seed: dropped before any scoring (the ε absorbs the
    *    arbitrary-order float sum vs the fixed-order exact score).
    *  3. SCORE — the exact BM25 plan over SURVIVORS only (df stays
    *    GLOBAL — computed once from the postings, never subset-local),
    *    then the TakeOrderedAndProject cut.
    *
    * Result is IDENTICAL to the unpruned top-K (TextIndexSpec proves
    * equality and that pruning strictly shrinks the scored set on a
    * skew-planted corpus); the oracle replays the FULL ranking + LIMIT.
    * Driver state: the ≤|terms| df map and k seed scores — bounded. */
  def searchRankedTopKPruned(s: SparkSession, d: String, terms0: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topKPrunedParts(s, d, terms0, k, k1, b)._2

  /** (survivor set, final top-K) — split so the spec can prove pruning
    * effectiveness without production-path counters. */
  private[graft] def topKPrunedParts(s: SparkSession, d: String,
      terms0: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75)
      : (DataFrame, DataFrame) = {
    val terms = terms0.distinct
    require(terms.nonEmpty, "empty search")
    require(k >= 1, s"k=$k")
    val idx = indexDir(s, d)
    val post = postings(s, d).filter(col("token").isin(terms: _*))
      .select(col("doc_id"), col("token"), col("tf"))
    val dfMap = post.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cs = s.read.parquet(s"$idx/corpus").head()
    val (nDocs, totalDl) = (cs.getLong(0), cs.getLong(1))
    val avgdl = totalDl.toDouble / nDocs
    def idf(t: String): Double = {
      val df = dfMap.getOrElse(t, 0L).toDouble
      math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    }
    // exact BM25 over a doc subset; df are global literals
    def scoreSubset(docs: DataFrame): DataFrame = {
      val hits = post.join(docs.select(col("doc_id")), Seq("doc_id"),
          "left_semi")
        .groupBy(col("doc_id")).pivot("token", terms).agg(first(col("tf")))
      val scored = hits.join(s.read.parquet(s"$idx/doclens"), "doc_id")
      def termScore(t: String) = {
        val tf = coalesce(col(t).cast("double"), lit(0.0))
        val norm = tf * lit(k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double")
            / lit(avgdl)))
        when(tf > 0, lit(idf(t)) * norm).otherwise(lit(0.0))
      }
      val score = terms.map(termScore).reduce(_ + _) // fixed order
      scored.select(col("doc_id"), round(score, 9).as("score"))
    }
    val rarest = terms.minBy(t => dfMap.getOrElse(t, 0L))
    val seed = scoreSubset(
      post.filter(col("token") === rarest).select(col("doc_id")))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .collect() // ≤ k rows
    val theta =
      if (seed.length < k) Double.NegativeInfinity
      else seed.last.getDouble(1)
    val sp = s
    import sp.implicits._
    val ubs = terms.map(t => t -> idf(t) * (k1 + 1.0)).toDF("token", "ub")
    val survivors = post.join(broadcast(ubs), "token")
      .groupBy(col("doc_id")).agg(sum(col("ub")).as("__ub"))
      .filter(col("__ub") >= lit(theta - 1e-9))
    (survivors, scoreSubset(survivors)
      .orderBy(col("score").desc, col("doc_id")).limit(k))
  }

  /** Driver-gate pruned top-K: same oracle as the unpruned cut (the
    * full ranking LIMIT K) — hash equality proves the upper-bound
    * pruning dropped nothing. */
  def qDocSearchTopkPruned(s: SparkSession, d: String): DataFrame =
    searchRankedTopKPruned(s, d, SearchTerms, 10)

  def qDocSearchTopkPrunedSql: String = qDocSearchTopkSql

  /** OR-semantics boolean search — docs containing ANY of `terms`, with
    * the matched-term count (the cheap recall-first retrieval a ranked
    * pass narrows): same manifest-pruned posting scan as [[search]],
    * one doc_id shuffle, output match-sized. */
  def searchAny(s: SparkSession, d: String, terms0: Seq[String]): DataFrame = {
    val terms = terms0.distinct
    require(terms.nonEmpty, "empty search")
    postings(s, d)
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("token")).as("n_terms"))
  }

  /** Driver-gate query: three-term AND search through the index; the
    * oracle re-derives membership from the text directly (identical
    * whitespace-token semantics — an index that dropped or invented a
    * posting hash-mismatches). */
  def qDocSearch(s: SparkSession, d: String): DataFrame =
    search(s, d, SearchTerms).orderBy(col("doc_id"))

  /** Driver-gate ranked query: BM25 over the three standard terms, all
    * matches + 9-dp scores (rank omitted on purpose: the VALUE set is
    * order-insensitive-hash-robust; a rank column would hinge on ulp
    * ties the rounding already absorbs). */
  def qDocSearchRanked(s: SparkSession, d: String): DataFrame =
    searchRanked(s, d, SearchTerms)

  /** The DuckDB BM25 oracle-SQL building blocks — ONE copy of the
    * determinism discipline (k1/b constants, 9-dp rounding target, the
    * exact ln((N−df+0.5)/(df+0.5)+1) score expression) shared by every
    * ranked-retrieval oracle (plain/top-K/pruned/phrase-ranked here,
    * RRF fusion in Similarity): a future tweak cannot silently diverge
    * for a subset of queries. Returns (tfCols, dfCols, termList,
    * scoreExpr) over the conventional `postings`/`doclens`/`corpus`
    * CTE names. */
  private[operators] def bm25SqlParts(terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75)
      : (String, String, String, String) = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN token = '$t' THEN tf ELSE 0 END) AS tf_$i"
    }.mkString(", ")
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"(SELECT count(*) FROM postings WHERE token = '$t') AS df_$i"
    }.mkString(", ")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val scoreExpr = terms.indices.map { i =>
      s"""(CASE WHEN tf_$i > 0 THEN
         | ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0)
         | * ((tf_$i * ${k1 + 1.0})
         |   / (tf_$i + $k1 * ((1.0 - $b) + $b * dl / (total_dl * 1.0 / n_docs))))
         | ELSE 0.0 END)""".stripMargin.replace("\n", " ")
    }.reduce((a, c) => s"($a + $c)")
    (tfCols, dfCols, termList, scoreExpr)
  }

  def qDocSearchRankedSql: String = {
    val terms = SearchTerms
    val (tfCols, dfCols, termList, scoreExpr) = bm25SqlParts(terms)
    s"""WITH toks AS (
       | SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +'))
       |   AS token FROM documents),
       |postings AS (
       | SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
       | FROM toks GROUP BY 1, 2),
       |doclens AS (
       | SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl
       | FROM postings GROUP BY 1),
       |corpus AS (
       | SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |        CAST(sum(dl) AS DOUBLE) AS total_dl FROM doclens),
       |hits AS (
       | SELECT doc_id, $tfCols
       | FROM postings WHERE token IN ($termList) GROUP BY doc_id)
       |SELECT h.doc_id, round($scoreExpr, 9) AS score
       |FROM hits h
       |JOIN doclens USING (doc_id)
       |CROSS JOIN corpus
       |CROSS JOIN (SELECT $dfCols)
       |ORDER BY score DESC, h.doc_id""".stripMargin
  }

  /** Driver-gate top-K query: BM25 top-10 through the bounded cut; the
    * oracle replays the whole ranking and LIMITs it — hash equality
    * proves the heap cut == head-K of the full sort. */
  def qDocSearchTopk(s: SparkSession, d: String): DataFrame =
    searchRankedTopK(s, d, SearchTerms, 10)

  def qDocSearchTopkSql: String =
    qDocSearchRankedSql + "\nLIMIT 10"

  /** Driver-gate OR query: docs matching ANY of the three standard
    * terms with their matched-term counts; the oracle re-derives both
    * from the text. */
  def qDocSearchAny(s: SparkSession, d: String): DataFrame =
    searchAny(s, d, SearchTerms).orderBy(col("doc_id"))

  def qDocSearchAnySql: String = {
    val sums = SearchTerms
      .map(t =>
        s"CAST(list_contains(regexp_split_to_array(trim(text), ' +'), '$t') AS BIGINT)")
      .mkString(" + ")
    s"""SELECT doc_id, ($sums) AS n_terms FROM documents
       |WHERE $sums > 0
       |ORDER BY doc_id""".stripMargin
  }

  private[graft] val PhraseTerms = Seq("big", "order", "scan")

  /** Driver-gate phrase query: three-token phrase through the
    * positional index; the oracle re-derives adjacency from the raw
    * token arrays (an index with a wrong or unsorted position list
    * hash-mismatches). */
  def qDocPhrase(s: SparkSession, d: String): DataFrame =
    searchPhrase(s, d, PhraseTerms).orderBy(col("doc_id"))

  def qDocPhraseSql: String = {
    val conds = PhraseTerms.zipWithIndex.map { case (t, k) =>
      if (k == 0) s"ts[i] = '$t'" else s"ts[i+$k] = '$t'"
    }.mkString(" AND ")
    s"""WITH toks AS (
       | SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS ts
       | FROM documents)
       |SELECT doc_id FROM toks
       |WHERE len(list_filter(range(1, len(ts)+1), i -> $conds)) > 0
       |ORDER BY doc_id""".stripMargin
  }

  /** PHRASE-RANKED top-K — the standard "quoted query" serving shape:
    * the positional phrase filter narrows to docs containing the EXACT
    * consecutive phrase (candidate-sized — [[searchPhrase]]'s shifted
    * position intersection), then BM25 scores ONLY those candidates
    * (semi-join before the pivot/doclens join — the expensive scoring
    * never touches a non-phrase ANY-matcher) and the
    * TakeOrderedAndProject cut returns the top K. df stays GLOBAL (true
    * per-term document frequencies off the manifest-pruned posting scan
    * — subset-local df would re-rank against the unphrased query), so a
    * candidate's score equals its [[searchRanked]] score exactly; the
    * oracle replays the full BM25 ranking restricted to re-derived
    * adjacency matches and LIMITs it. */
  def searchPhraseRankedTopK(s: SparkSession, d: String,
      phrase: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    require(k >= 1, s"k=$k")
    val terms = phrase.distinct
    val idx = indexDir(s, d)
    val cands = searchPhrase(s, d, phrase)
    val post = postings(s, d).filter(col("token").isin(terms: _*))
      .select(col("doc_id"), col("token"), col("tf"))
    val dfMap = post.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cs = s.read.parquet(s"$idx/corpus").head()
    val (nDocs, totalDl) = (cs.getLong(0), cs.getLong(1))
    val avgdl = totalDl.toDouble / nDocs
    def idf(t: String): Double = {
      val df = dfMap.getOrElse(t, 0L).toDouble
      math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    }
    val hits = post.join(cands, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).pivot("token", terms).agg(first(col("tf")))
    val scored = hits.join(s.read.parquet(s"$idx/doclens"), "doc_id")
    def termScore(t: String) = {
      val tf = coalesce(col(t).cast("double"), lit(0.0))
      val norm = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double")
          / lit(avgdl)))
      when(tf > 0, lit(idf(t)) * norm).otherwise(lit(0.0))
    }
    val score = terms.map(termScore).reduce(_ + _) // fixed order
    scored.select(col("doc_id"), round(score, 9).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Driver-gate phrase-ranked query: BM25 top-10 over the docs
    * containing the exact phrase; the oracle re-derives adjacency from
    * the raw token arrays AND replays the full restricted ranking —
    * hash equality proves both the candidate set and the cut. */
  def qDocPhraseRanked(s: SparkSession, d: String): DataFrame =
    searchPhraseRankedTopK(s, d, PhraseTerms, 10)

  def qDocPhraseRankedSql: String = {
    val terms = PhraseTerms.distinct
    val adjConds = PhraseTerms.zipWithIndex.map { case (t, j) =>
      if (j == 0) s"ts[i] = '$t'" else s"ts[i+$j] = '$t'"
    }.mkString(" AND ")
    val (tfCols, dfCols, termList, scoreExpr) = bm25SqlParts(terms)
    s"""WITH toksa AS (
       | SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS ts
       | FROM documents),
       |cands AS (
       | SELECT doc_id FROM toksa
       | WHERE len(list_filter(range(1, len(ts)+1), i -> $adjConds)) > 0),
       |toks AS (SELECT doc_id, unnest(ts) AS token FROM toksa),
       |postings AS (
       | SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
       | FROM toks GROUP BY 1, 2),
       |doclens AS (
       | SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl
       | FROM postings GROUP BY 1),
       |corpus AS (
       | SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |        CAST(sum(dl) AS DOUBLE) AS total_dl FROM doclens),
       |hits AS (
       | SELECT doc_id, $tfCols
       | FROM postings WHERE token IN ($termList)
       |   AND doc_id IN (SELECT doc_id FROM cands)
       | GROUP BY doc_id)
       |SELECT h.doc_id, round($scoreExpr, 9) AS score
       |FROM hits h
       |JOIN doclens USING (doc_id)
       |CROSS JOIN corpus
       |CROSS JOIN (SELECT $dfCols)
       |ORDER BY score DESC, h.doc_id
       |LIMIT 10""".stripMargin
  }

  def qDocSearchSql: String = {
    val conds = SearchTerms
      .map(t => s"list_contains(regexp_split_to_array(trim(text), ' +'), '$t')")
      .mkString(" AND ")
    s"""SELECT doc_id FROM documents
       |WHERE $conds
       |ORDER BY doc_id""".stripMargin
  }
}
