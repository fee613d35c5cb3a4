package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.C — text analysis over `documents`, the language/quality/token layer a
  * 100 TB training-data pipeline runs before dedup. All operators are pure
  * column expressions (whole-stage codegen, no UDFs) and scale linearly —
  * no shuffle except the final small aggregations.
  */
object TextOps {

  /** Distinct-token-set of a document (lowercase word bags in this corpus). */
  def tokens(c: Column): Column = split(trim(c), " +")

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** BPE-ish pre-tokenizer regex (GPT-2-family shape: contraction tails,
    * space-prefixed letter runs, digit runs, punctuation runs) — the cheap
    * LLM-token-count proxy a pipeline budgets corpora with. ASCII form
    * (this corpus is lowercase ASCII); kept lookahead-free so the same
    * pattern runs on Java regex and RE2-family engines alike. */
  val BpePattern = "'(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9']+"

  /** Token counting (whitespace words + BPE-ish subword proxy) +
    * per-language corpus stats. */
  def qDocTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("n_bpe",
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("total_tokens"),
        sum(col("n_bpe")).cast("bigint").as("total_bpe_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  def qDocTokensSql: String =
    """SELECT lang, count(*) AS n_docs,
      | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      | CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
      | min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
      |FROM (SELECT lang,
      |  CAST(len(regexp_split_to_array(trim(text), ' +')) AS INT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9'']+')) AS INT) AS n_bpe
      |  FROM documents) t
      |GROUP BY lang""".stripMargin

  /** CORPUS CARD — the per-source dataset-card report a training-data
    * pipeline publishes before a corpus ships: doc/char/token/BPE-token
    * totals, language spread, mean document length, the share passing a
    * quality floor, and the exact-duplicate count — ALL IN ONE aggregate
    * pass over the corpus (one scan; the two distinct-counts share one
    * Expand, bounded at 3× the frame — never per-metric scans).
    *
    * Oracle discipline: every metric is an exact integer except
    * mean_tokens (exact-int sum ÷ exact count, divided as doubles in the
    * same op order — bit-identical) ; the quality floor compares
    * 2·n_distinct ≥ n_tokens in integers (no ratio doubles); exact dups
    * count distinct md5(text) so the shuffle moves 32-char hashes, not
    * document bodies — at 100 TB that is the difference between a
    * metadata-sized distinct and re-shuffling the corpus. */
  def qCorpusCard(s: SparkSession, d: String): DataFrame =
    Tables.documentsWide(s, d) // r17: scan-width guard (BPE regex per doc)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("n_bpe",
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("total_chars"),
        sum(col("n_tokens")).cast("bigint").as("total_tokens"),
        sum(col("n_bpe")).cast("bigint").as("total_bpe_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("mean_tokens"),
        sum(when(col("n_tokens") >= 12
            && col("n_distinct") * 2 >= col("n_tokens"), 1).otherwise(0))
          .cast("bigint").as("n_quality"),
        (count(lit(1)) - countDistinct(md5(col("text"))))
          .cast("bigint").as("n_exact_dups"))

  def qCorpusCardSql: String =
    """SELECT source, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS total_chars,
      | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      | CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
      | CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      | CAST(sum(n_tokens) AS DOUBLE) / count(*) AS mean_tokens,
      | CAST(sum(CASE WHEN n_tokens >= 12 AND 2 * n_distinct >= n_tokens
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      | CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups
      |FROM (SELECT source, lang, n_chars, text,
      |  CAST(len(regexp_split_to_array(trim(text), ' +')) AS INT) AS n_tokens,
      |  CAST(len(list_distinct(regexp_split_to_array(trim(text), ' +'))) AS INT) AS n_distinct,
      |  CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9'']+')) AS INT) AS n_bpe
      |  FROM documents) t
      |GROUP BY source""".stripMargin

  /** Per-document quality features: token count, vocabulary diversity
    * (distinct ratio), stopword ratio, chars-per-token; filtered to the
    * "keep" set a pretraining pipeline would retain. */
  def qDocQuality(s: SparkSession, d: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("n_stop", size(array_intersect(col("toks"), stopArr)))
      .filter(col("n_tokens") >= 12)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
        (col("n_stop").cast("double") / col("n_distinct")).as("stop_ratio"),
        (col("n_chars").cast("double") / col("n_tokens")).as("chars_per_token"))
  }

  def qDocQualitySql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, n_tokens, n_distinct,
       | CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
       | CAST(n_stop AS DOUBLE) / n_distinct AS stop_ratio,
       | CAST(n_chars AS DOUBLE) / n_tokens AS chars_per_token
       |FROM (SELECT doc_id, n_chars,
       |  CAST(len(toks) AS INT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       |  CAST(len(list_intersect(list_distinct(toks), [$stopList])) AS INT) AS n_stop
       | FROM (SELECT doc_id, n_chars, regexp_split_to_array(trim(text), ' +') AS toks FROM documents) x) t
       |WHERE n_tokens >= 12""".stripMargin
  }

  /** GOPHER RULE-SET QUALITY FILTER (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * Appendix A1.1 — the named rule battery MassiveText/RefinedWeb/
    * FineWeb all start from): per document, the seven published gates —
    * word count in [50, 100000]; mean word length in [3, 10]; symbol-to-
    * word ratio ('#' chars + '...' occurrences) ≤ 0.1; ≤90% of lines
    * bullet-started; ≤30% of lines ellipsis-ended; ≥80% of words contain
    * an alphabetic char; ≥2 of the 8 canonical stop words present — with
    * a per-source report of each rule's kill count and the all-rules
    * survivor count. Every ratio gate is an exact INTEGER
    * cross-multiplication (10·sym > words, 5·alpha < 4·words, …) — no
    * float ever decides a rule, so the oracle is plain arithmetic SQL.
    *
    * Scale shape: ONE scan, pure column/lambda expressions (no UDF, no
    * join, no explode — the arrays fold in place), one map-side-combined
    * aggregation to #sources rows. */
  def qDocGopher(s: SparkSession, d: String): DataFrame = {
    val gopherStops =
      Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val docs = Tables.documents(s, d)
      .withColumn("t", tokens(col("text")))
      .withColumn("lns", split(col("text"), "\n"))
      .withColumn("n_words", size(col("t")).cast("long"))
      .withColumn("n_chars_w",
        aggregate(col("t"), lit(0L), (acc, x) => acc + length(x)))
      .withColumn("n_sym",
        (length(col("text")) -
          length(regexp_replace(col("text"), "#", ""))).cast("long") +
          ((length(col("text")) -
            length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
            .cast("long"))
      .withColumn("n_lines", size(col("lns")).cast("long"))
      .withColumn("n_bullet",
        size(filter(col("lns"), l => l.startsWith("- ") ||
          l.startsWith("* ") || l.startsWith("• "))).cast("long"))
      .withColumn("n_ell",
        size(filter(col("lns"), l => l.endsWith("..."))).cast("long"))
      .withColumn("n_alpha",
        size(filter(col("t"), x => x.rlike("[a-zA-Z]"))).cast("long"))
      .withColumn("n_stop",
        size(array_intersect(array_distinct(col("t")),
          array(gopherStops.map(lit): _*))).cast("long"))
    val fWc = !(col("n_words") >= 50 && col("n_words") <= 100000L)
    val fMwl = !(lit(3) * col("n_words") <= col("n_chars_w") &&
      col("n_chars_w") <= lit(10) * col("n_words"))
    val fSym = lit(10) * col("n_sym") > col("n_words")
    val fBul = lit(10) * col("n_bullet") > lit(9) * col("n_lines")
    val fEll = lit(10) * col("n_ell") > lit(3) * col("n_lines")
    val fAlp = lit(5) * col("n_alpha") < lit(4) * col("n_words")
    val fStp = col("n_stop") < 2
    def cnt(c: Column, n: String) = count(when(c, 1)).as(n)
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      cnt(fWc, "n_fail_wordcount"), cnt(fMwl, "n_fail_meanwordlen"),
      cnt(fSym, "n_fail_symbol"), cnt(fBul, "n_fail_bullet"),
      cnt(fEll, "n_fail_ellipsis"), cnt(fAlp, "n_fail_alpha"),
      cnt(fStp, "n_fail_stopword"),
      cnt(!(fWc || fMwl || fSym || fBul || fEll || fAlp || fStp),
        "n_pass"))
  }

  def qDocGopherSql: String =
    """WITH m AS (
      |  SELECT source,
      |    CAST(len(t) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
      |      AS n_chars_w,
      |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      |      + CAST((length(text) - length(replace(text, '...', ''))) / 3
      |          AS BIGINT) AS n_sym,
      |    CAST(len(lns) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(lns, l -> l LIKE '- %' OR l LIKE '* %'
      |      OR l LIKE chr(8226) || ' %')) AS BIGINT) AS n_bullet,
      |    CAST(len(list_filter(lns, l -> l LIKE '%...')) AS BIGINT)
      |      AS n_ell,
      |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]')))
      |      AS BIGINT) AS n_alpha,
      |    CAST(len(list_intersect(list_distinct(t),
      |      ['the','be','to','of','and','that','have','with']))
      |      AS BIGINT) AS n_stop
      |  FROM (SELECT source, text,
      |          regexp_split_to_array(trim(text), ' +') AS t,
      |          string_split(text, chr(10)) AS lns
      |        FROM documents) x
      |), f AS (
      |  SELECT source,
      |    NOT (n_words >= 50 AND n_words <= 100000) AS f_wc,
      |    NOT (3 * n_words <= n_chars_w AND n_chars_w <= 10 * n_words)
      |      AS f_mwl,
      |    10 * n_sym > n_words AS f_sym,
      |    10 * n_bullet > 9 * n_lines AS f_bul,
      |    10 * n_ell > 3 * n_lines AS f_ell,
      |    5 * n_alpha < 4 * n_words AS f_alp,
      |    n_stop < 2 AS f_stp
      |  FROM m
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(CASE WHEN f_wc THEN 1 END) AS BIGINT)
      |    AS n_fail_wordcount,
      |  CAST(count(CASE WHEN f_mwl THEN 1 END) AS BIGINT)
      |    AS n_fail_meanwordlen,
      |  CAST(count(CASE WHEN f_sym THEN 1 END) AS BIGINT) AS n_fail_symbol,
      |  CAST(count(CASE WHEN f_bul THEN 1 END) AS BIGINT) AS n_fail_bullet,
      |  CAST(count(CASE WHEN f_ell THEN 1 END) AS BIGINT)
      |    AS n_fail_ellipsis,
      |  CAST(count(CASE WHEN f_alp THEN 1 END) AS BIGINT) AS n_fail_alpha,
      |  CAST(count(CASE WHEN f_stp THEN 1 END) AS BIGINT)
      |    AS n_fail_stopword,
      |  CAST(count(CASE WHEN NOT (f_wc OR f_mwl OR f_sym OR f_bul OR f_ell
      |    OR f_alp OR f_stp) THEN 1 END) AS BIGINT) AS n_pass
      |FROM f GROUP BY source""".stripMargin

  /** The fixed blocklist for [[qDocBadwords]] (stand-in for C4's
    * published "bad words" list; `dup` is deliberately a live corpus
    * token so the filter has real kills, the others exercise the
    * absent-term path). */
  val Blocklist = Seq("dup", "stale", "panic")

  /** C4-STYLE BLOCKLIST FILTER (Raffel et al. 2020 §2.2 — C4 drops any
    * page containing a word from a fixed blocklist; every web-corpus
    * pipeline since ships the same gate for URLs and content): per
    * source, how many documents contain ≥1 blocklisted TOKEN
    * (whole-token match — the published rule; substring matching
    * over-kills), total blocklisted-token occurrences, and the
    * survivor count. Pure integer counting — trivially oracle-exact.
    *
    * Scale shape: ONE scan, a per-row lambda filter over the
    * materialized token array (no explode, no join — the blocklist is
    * a literal in the plan), one map-side-combined agg to #sources
    * rows. A large real-world list would broadcast-join an exploded
    * token stream instead; at list sizes like C4's (~400 terms) the
    * in-plan literal is still the right call. */
  def qDocBadwords(s: SparkSession, d: String): DataFrame = {
    val hits = size(filter(col("t"), x => x.isin(Blocklist: _*)))
    Tables.documents(s, d)
      .withColumn("t", tokens(col("text")))
      .withColumn("hits", hits.cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("hits") > 0, 1)).as("n_flagged"),
        sum(col("hits")).cast("long").as("blocked_hits"),
        count(when(col("hits") === 0, 1)).as("n_pass"))
  }

  def qDocBadwordsSql: String = {
    val list = Blocklist.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (
       |  SELECT source,
       |    CAST(len(list_filter(regexp_split_to_array(trim(text), ' +'),
       |      x -> x IN ($list))) AS BIGINT) AS hits
       |  FROM documents
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(CASE WHEN hits > 0 THEN 1 END) AS BIGINT) AS n_flagged,
       |  CAST(sum(hits) AS BIGINT) AS blocked_hits,
       |  CAST(count(CASE WHEN hits = 0 THEN 1 END) AS BIGINT) AS n_pass
       |FROM m GROUP BY source""".stripMargin
  }

  /** Marker-word language-ID heuristic + accuracy against the labeled
    * `lang` column. (A real n-gram profile model is engine-side identical;
    * the fixed marker rule keeps the oracle expressible in ANSI SQL.) */
  def qDocLangid(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("pred",
        when(col("text").contains("data"), "en")
          .when(col("text").contains("table"), "de")
          .when(col("text").contains("query"), "fr")
          .when(col("text").contains("row"), "es")
          .otherwise("zh"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy", col("n_correct").cast("double") / col("n_docs"))

  def qDocLangidSql: String =
    """SELECT lang, n_docs, n_correct, CAST(n_correct AS DOUBLE) / n_docs AS accuracy
      |FROM (SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      | FROM (SELECT lang,
      |   CASE WHEN text LIKE '%data%' THEN 'en'
      |        WHEN text LIKE '%table%' THEN 'de'
      |        WHEN text LIKE '%query%' THEN 'fr'
      |        WHEN text LIKE '%row%' THEN 'es'
      |        ELSE 'zh' END AS pred
      |  FROM documents) p GROUP BY lang) t""".stripMargin

  /** Languages this corpus labels (fixed, like the marker rule above —
    * the q_doc_langid precedent of hardcoding the label set in both
    * engines' text). */
  val LangSet = Seq("de", "en", "es", "fr", "zh")

  /** MODEL-BASED LANGUAGE ID — the real form of the marker heuristic
    * above: a Naive Bayes classifier over CHARACTER-TRIGRAM profiles,
    * TRAINED IN THE ENGINE on half the corpus (even doc_ids) and
    * evaluated on both splits — the fastText-langid shape (char n-gram
    * profiles + additive smoothing + argmax log-likelihood), which is
    * how production pipelines actually tag language.
    *
    * Exactness discipline (the DSIR grid): every log factor quantizes
    * ONCE to floor(1e6·ln(count+1)) — counts are integers, so the
    * distinct ln() inputs are bounded — and a doc's per-language score
    * is the exact BIGINT sum Σ_g L_g(lang) − n_g·floor(1e6·ln(N_lang+V))
    * (add-1 smoothing; an unseen trigram contributes ln 1 = 0 exactly in
    * both engines). Argmax ties break by the fixed language order via an
    * identical CASE chain in both engines — fully oracle-replayable,
    * unlike any float-likelihood formulation.
    *
    * Scale shape: the profile is TRIGRAM-ALPHABET-BOUNDED (≤128³ ASCII —
    * broadcastable at any corpus size, the q_doc_typicality argument);
    * scoring is one explode + profile join + per-doc map-side-combined
    * re-aggregation; the report is langs×2 rows. */
  def qDocLangidModel(s: SparkSession, d: String): DataFrame =
    langidModel(Tables.documentsWide(s, d)) // r17: scan-width guard (Tables.documentsWide)

  /** Core of [[qDocLangidModel]] over any (doc_id, text, lang) frame —
    * split out so the spec can plant a corpus with REAL per-language
    * character distributions: on THIS synthetic corpus the lang labels
    * are ~text-independent (even the generator's own marker rule scores
    * 35% overall), so holdout accuracy sits at chance — which is the
    * honest behavior (the model finds no structure because none exists;
    * the spec proves 100% holdout where signal is planted). */
  private[graft] def langidModel(docs: DataFrame): DataFrame = {
    def lq1p(c: Column): Column =
      floor(lit(1e6) * log(c.cast("double") + 1)).cast("long")
    val tris = docs
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        (col("doc_id") % 2 === 0).as("train"),
        explode(transform(sequence(lit(1), length(col("text")) - 2),
          i => col("text").substr(i, lit(3)))).as("g"))
    val aggs = LangSet.map(L =>
      count(when(col("lang") === L && col("train"), 1)).as(s"c_$L"))
    val prof = tris.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      .localCheckpoint() // alphabet-bounded; feeds totals + the join
    val trow = prof.agg(count(lit(1)),
      LangSet.map(L => sum(col(s"c_$L"))): _*).head()
    val v = trow.getLong(0)
    val lqNorm: Map[String, Long] = LangSet.zipWithIndex.map {
      case (l, i) =>
        l -> math.floor(1e6 * math.log((trow.getLong(i + 1) + v)
          .toDouble)).toLong
    }.toMap
    val perDoc = tris.join(prof, Seq("g"), "left")
      .groupBy(col("doc_id"), col("lang"), col("train"))
      .agg(count(lit(1)).as("n_g"),
        LangSet.map(L => sum(lq1p(coalesce(col(s"c_$L"), lit(0L))))
          .cast("long").as(s"sum_$L")): _*)
    val scored = perDoc.select(
      Seq(col("doc_id"), col("lang"), col("train"), col("n_g")) ++
        LangSet.map(L => (col(s"sum_$L") - col("n_g") * lit(lqNorm(L)))
          .as(s"s_$L")): _*)
    // argmax with fixed-order tie-break: the earliest language whose
    // score is >= every later one wins (same CASE chain as the oracle)
    val pred = LangSet.init.zipWithIndex.foldRight(
      lit(LangSet.last): Column) { case ((l, i), els) =>
      val beats = LangSet.drop(i + 1)
        .map(r => col(s"s_$l") >= col(s"s_$r")).reduce(_ && _)
      when(beats, l).otherwise(els)
    }
    scored.withColumn("pred", pred)
      .groupBy(col("lang"), col("train"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("pred") === col("lang"), 1)).as("n_correct"))
      .select(col("lang"),
        when(col("train"), "train").otherwise("holdout").as("split"),
        col("n_docs"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_docs")).as("accuracy"))
  }

  def qDocLangidModelSql: String = {
    val cCols = LangSet.map(L =>
      s"CAST(count(CASE WHEN lang = '$L' AND train THEN 1 END) AS BIGINT) AS c_$L")
      .mkString(",\n      |    ")
    val sumCols = LangSet.map(L =>
      s"CAST(sum(CAST(floor(CAST(1000000 AS DOUBLE) * ln(CAST(COALESCE(c_$L, 0) AS DOUBLE) + 1)) AS BIGINT)) AS BIGINT) AS sum_$L")
      .mkString(",\n      |    ")
    val nCols = LangSet.map(L =>
      s"CAST(sum(c_$L) AS BIGINT) AS n_$L").mkString(", ")
    val sCols = LangSet.map(L =>
      (s"sum_$L - n_g * CAST(floor(CAST(1000000 AS DOUBLE) " +
        s"* ln(CAST(n_$L + v AS DOUBLE))) AS BIGINT) AS s_$L"))
      .mkString(",\n      |    ")
    val predArms = LangSet.init.zipWithIndex.map { case (l, i) =>
      val beats = LangSet.drop(i + 1).map(r => s"s_$l >= s_$r")
        .mkString(" AND ")
      s"WHEN $beats THEN '$l'"
    }.mkString(" ")
    s"""WITH tg AS (
      |  SELECT doc_id, lang, doc_id % 2 = 0 AS train,
      |    substr(text, CAST(i AS INT), 3) AS g
      |  FROM (SELECT doc_id, lang, text,
      |      unnest(generate_series(1, length(text) - 2)) AS i
      |    FROM documents WHERE length(text) >= 3)
      |), prof AS MATERIALIZED (
      |  SELECT g,
      |    $cCols
      |  FROM tg GROUP BY g
      |), tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS v, $nCols FROM prof
      |), perdoc AS (
      |  SELECT doc_id, lang, train, CAST(count(*) AS BIGINT) AS n_g,
      |    $sumCols
      |  FROM tg LEFT JOIN prof USING (g)
      |  GROUP BY doc_id, lang, train
      |), scored AS (
      |  SELECT doc_id, lang, train,
      |    $sCols
      |  FROM perdoc CROSS JOIN tot
      |), p AS (
      |  SELECT lang, train,
      |    CASE $predArms ELSE '${LangSet.last}' END AS pred
      |  FROM scored
      |)
      |SELECT lang, CASE WHEN train THEN 'train' ELSE 'holdout' END AS split,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(CASE WHEN pred = lang THEN 1 END) AS BIGINT)
      |    AS n_correct,
      |  CAST(count(CASE WHEN pred = lang THEN 1 END) AS DOUBLE) / count(*)
      |    AS accuracy
      |FROM p GROUP BY lang, train""".stripMargin
  }

  /** TF-IDF: term frequencies per doc joined to corpus-level document
    * frequencies, each doc keeping its top-scored term. Two shuffles (per-doc
    * term counts; per-term doc frequency). The DF side is vocabulary-sized —
    * unbounded at corpus scale — so it joins by shuffle on `term` (AQE still
    * broadcasts when genuinely small); nDocs comes from an in-plan 1-row
    * aggregate cross-joined in (one Spark job, no driver-side count at plan
    * build). Rows-only check (log() libm values differ across engines in
    * the last ulp); spec verifies against a driver-side computation. */
  def qDocTfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("_n_docs"))
    val terms = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .crossJoin(nDocs) // 1 row -> broadcast nested loop, no real shuffle
      .withColumn("tfidf", col("tf") * log(col("_n_docs") / col("df")))
      .drop("_n_docs")
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("term"), col("tfidf")), struct(col("tfidf"), col("term"))).as("best"),
        count(lit(1)).as("n_distinct_terms"))
      .select(col("doc_id"), col("best.term").as("top_term"),
        col("best.tfidf").as("top_tfidf"), col("n_distinct_terms"))
  }

  /** Corpus-level n-gram statistics: explode word bigrams, count, top-20.
    * The explode is the one row-multiplying stage (×~tokens per doc); the
    * count is a standard two-phase agg and top-K avoids a global sort. */
  def qDocNgrams(s: SparkSession, d: String): DataFrame = {
    // materialize the token array ONCE per row: referencing the split
    // expression inside the transform lambda would re-run the regex split
    // per array element (O(tokens²) per doc)
    val bigrams = transform(
      sequence(lit(0), size(col("toks")) - 2),
      i => concat_ws(" ", element_at(col("toks"), i + 1),
        element_at(col("toks"), i + 2)))
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("bigram"))
      .limit(20)
  }

  def qDocNgramsSql: String =
    """SELECT bigram, count(*) AS n_occurrences FROM (
      | SELECT unnest(list_transform(range(1, len(toks)),
      |   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      | FROM (SELECT regexp_split_to_array(trim(text), ' +') AS toks FROM documents) t)
      |GROUP BY bigram ORDER BY n_occurrences DESC, bigram LIMIT 20""".stripMargin

  /** COLLOCATION MINING via pointwise mutual information — the corpus-
    * linguistics signal behind phrase vocabularies and tokenizer merge
    * seeds ("how much more often do a,b appear ADJACENT than chance"):
    * PMI(a,b) = ln( P(ab) / (P(a)·P(b)) ) over adjacent-pair space vs
    * unigram space, min support 5. Cross-engine determinism: counts are
    * exact BIGINTs, the ln argument assembles as one FIXED-association
    * double expression (((n_ab·Ntok)·Ntok) / ((Nbig·n_a)·n_b) — IEEE
    * multiplication is deterministic, so both engines feed ln the
    * identical double), and the score rounds to 9 dp to absorb ln() ULP
    * slack (the BM25 discipline). Plan: one tokenize feeding bigram and
    * unigram aggregates, two HINT-FREE joins of the unigram relation
    * onto the bigram relation (the distinct-token relation is
    * VOCABULARY-scaled — Heaps-sublinear but unbounded with web junk, so
    * AQE size-drives the broadcast while it fits and falls back to a
    * shuffle join past the threshold, the §3 rule-1 / q_doc_rarity
    * discipline), scalar totals as broadcast 1-row cross joins. */
  def qDocCollocations(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .localCheckpoint() // one tokenize feeds bigram AND unigram counts
    val bigrams = docs.select(explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i + 1).as("a"),
          element_at(col("toks"), i + 2).as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val unigrams = docs
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val totals = bigrams.agg(sum(col("n_ab")).as("n_big"))
      .crossJoin(unigrams.agg(sum(col("n")).as("n_tok")))
    val arg = ((col("n_ab").cast("double") * col("n_tok").cast("double"))
      * col("n_tok").cast("double")) /
      ((col("n_big").cast("double") * col("n_a").cast("double"))
        * col("n_b").cast("double"))
    bigrams.filter(col("n_ab") >= 5)
      .join(unigrams.select(col("tok").as("a"), col("n").as("n_a")), "a")
      .join(unigrams.select(col("tok").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_ab"),
        round(log(arg), 9).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
  }

  def qDocCollocationsSql: String =
    """WITH docs AS (
      | SELECT regexp_split_to_array(trim(text), ' +') AS toks
      | FROM documents WHERE len(regexp_split_to_array(trim(text), ' +')) >= 2),
      |big AS (
      | SELECT bg['a'] AS a, bg['b'] AS b, CAST(count(*) AS BIGINT) AS n_ab
      | FROM (SELECT unnest(list_transform(range(1, len(toks)),
      |   i -> {'a': toks[i], 'b': toks[i+1]})) AS bg FROM docs)
      | GROUP BY 1, 2),
      |uni AS (
      | SELECT tok, CAST(count(*) AS BIGINT) AS n
      | FROM (SELECT unnest(toks) AS tok FROM docs) GROUP BY 1),
      |tot AS (
      | SELECT (SELECT CAST(sum(n_ab) AS BIGINT) FROM big) AS n_big,
      |        (SELECT CAST(sum(n) AS BIGINT) FROM uni) AS n_tok)
      |SELECT big.a, big.b, n_ab,
      | round(ln(((CAST(n_ab AS DOUBLE) * CAST(n_tok AS DOUBLE))
      |     * CAST(n_tok AS DOUBLE))
      |   / ((CAST(n_big AS DOUBLE) * CAST(ua.n AS DOUBLE))
      |     * CAST(ub.n AS DOUBLE))), 9) AS pmi
      |FROM big
      |JOIN uni ua ON ua.tok = big.a
      |JOIN uni ub ON ub.tok = big.b
      |CROSS JOIN tot
      |WHERE n_ab >= 5
      |ORDER BY pmi DESC, big.a, big.b""".stripMargin

  /** Token RARITY scoring — the frequency-based curation signal (rare
    * vocabulary ≈ specialized or noisy text; a cheap relational stand-in
    * for model-based perplexity, which needs no model): per document, the
    * average GLOBAL occurrence count of its tokens. Deliberately free of
    * transcendentals — a log-prob formulation would hash-diverge on libm
    * ULP differences across engines; exact BIGINT sums with ONE double
    * division in the final projection are engine-identical.
    *
    * Scale shape: explode → token groupBy (two-phase, vocab-bounded
    * reduce) → join back on token (both sides shuffle on the token key;
    * Zipf skew on hot tokens is AQE-skew-join territory, and the join
    * carries only (doc_id, cnt) — no text) → per-doc agg. */
  def qDocRarity(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val global = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
    toks.join(global, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("sum_cnt"), count(lit(1)).as("n_tok"))
      .select(col("doc_id"), col("sum_cnt"), col("n_tok"),
        (col("sum_cnt").cast("double") / col("n_tok")).as("avg_tok_freq"))
  }

  def qDocRaritySql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
      |  FROM documents),
      |g AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY tok)
      |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS sum_cnt,
      |       CAST(count(*) AS BIGINT) AS n_tok,
      |       CAST(sum(cnt) AS DOUBLE) / count(*) AS avg_tok_freq
      |FROM t JOIN g USING (tok) GROUP BY doc_id""".stripMargin

  /** Benchmark-contamination detection — the training-data hygiene query:
    * which corpus documents share verbatim n-gram spans with a held-out
    * benchmark set (here: docs 0-9 as the stand-in benchmark). Exact and
    * decisions-shaped: per-document overlap counts, never a pair list.
    *
    * Scale shape: the benchmark gram set is tiny next to the corpus (a
    * benchmark suite vs a 100 TB crawl) — the join shuffles on the gram
    * key and AQE broadcasts the benchmark side when it proves small; the
    * corpus side is one explode (×tokens) + two-phase distinct counts. */
  def qContamination(s: SparkSession, d: String): DataFrame = {
    // materialize toks ONCE (see qDocNgrams: a split expression inside the
    // transform lambda re-runs the regex per element)
    val trigrams = transform(
      sequence(lit(0), size(col("toks")) - 3),
      i => concat_ws(" ", element_at(col("toks"), i + 1),
        element_at(col("toks"), i + 2), element_at(col("toks"), i + 3)))
    val g = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(trigrams).as("g"))
      .localCheckpoint() // 3 consumers below — never re-tokenize the corpus
    val bench = g.filter(col("doc_id") < 10).select(col("g")).distinct()
    val corpus = g.filter(col("doc_id") >= 10)
    val hits = corpus.join(bench, "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_overlap"))
    val totals = corpus.groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_grams"))
    hits.join(totals, "doc_id")
      .select(col("doc_id"), col("n_overlap"), col("n_grams"),
        (col("n_overlap").cast("double") / col("n_grams")).as("contamination"))
  }

  def qContaminationSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents),
      |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      |      FROM t, unnest(range(1, len(w)-1)) AS r(i) WHERE len(w) >= 3),
      |bench AS (SELECT DISTINCT g FROM g WHERE doc_id < 10),
      |corpus AS (SELECT doc_id, g FROM g WHERE doc_id >= 10),
      |hits AS (SELECT doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_overlap
      |         FROM corpus c JOIN bench b USING (g) GROUP BY doc_id),
      |tot AS (SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_grams
      |        FROM corpus GROUP BY doc_id)
      |SELECT h.doc_id, h.n_overlap, tot.n_grams,
      |  CAST(h.n_overlap AS DOUBLE) / tot.n_grams AS contamination
      |FROM hits h JOIN tot USING (doc_id)""".stripMargin

  /** Repetition quality signals (the C4/Gopher-family filters a training
    * corpus is scrubbed with): per document, the most-frequent-token share
    * and the duplicate-trigram share, plus a repetitive flag. All ratios
    * are exact integer divisions → bit-stable across engines. Two explodes
    * + two-phase aggs; decisions-shaped, one row per doc. */
  def qDocRepetition(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 3)
    val topTok = base.select(col("doc_id"), explode(col("toks")).as("tk"))
      .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_tok"), sum(col("c")).as("n_tokens"))
    val trigrams = transform(
      sequence(lit(0), size(col("toks")) - 3),
      i => concat_ws(" ", element_at(col("toks"), i + 1),
        element_at(col("toks"), i + 2), element_at(col("toks"), i + 3)))
    val tri = base.select(col("doc_id"), explode(trigrams).as("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"), countDistinct(col("g")).as("n_tri_d"))
    topTok.join(tri, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        (col("max_tok").cast("double") / col("n_tokens")).as("top_tok_frac"),
        (lit(1.0) - col("n_tri_d").cast("double") / col("n_tri")).as("dup_trigram_frac"))
      .withColumn("repetitive",
        col("top_tok_frac") >= 0.15 || col("dup_trigram_frac") >= 0.02)
  }

  def qDocRepetitionSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
      |           FROM documents WHERE len(regexp_split_to_array(trim(text), ' +')) >= 3),
      |tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
      |tc AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_tok, CAST(sum(c) AS BIGINT) AS n_tokens
      |       FROM (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk)
      |       GROUP BY doc_id),
      |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      |      FROM t, unnest(range(1, len(w)-1)) AS r(i)),
      |tri AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
      |        CAST(count(DISTINCT g) AS BIGINT) AS n_tri_d FROM g GROUP BY doc_id)
      |SELECT tc.doc_id, tc.n_tokens,
      |  CAST(tc.max_tok AS DOUBLE) / tc.n_tokens AS top_tok_frac,
      |  1.0 - CAST(tri.n_tri_d AS DOUBLE) / tri.n_tri AS dup_trigram_frac,
      |  (CAST(tc.max_tok AS DOUBLE) / tc.n_tokens >= 0.15
      |   OR 1.0 - CAST(tri.n_tri_d AS DOUBLE) / tri.n_tri >= 0.02) AS repetitive
      |FROM tc JOIN tri USING (doc_id)""".stripMargin

  /** Context-window chunk size / overlap (tokens). The corpus' docs run
    * 10-99 tokens, so 32/8 exercises 1-4 chunks per doc; production values
    * (512/64, 8192/…) are the same arithmetic. */
  val ChunkSize = 32
  val ChunkOverlap = 8

  /** Context-window CHUNKING — the batch-prep step between curation and
    * training (and the RAG indexing unit): split each document's token
    * stream into windows of ChunkSize tokens advancing by
    * ChunkSize−ChunkOverlap, last chunk ragged. Pure column arithmetic —
    * n_chunks = 1 + ceil(max(0, n−C) / (C−O)) and a sequence-explode per
    * doc; no shuffle at all (the explode is narrow), so it scales with the
    * corpus scan. Output is one row per chunk with its token span —
    * all-integer, engine-exact. */
  def qDocChunks(s: SparkSession, d: String): DataFrame = {
    val stride = ChunkSize - ChunkOverlap
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("n_chunks",
        lit(1) + ceil(greatest(col("n_tokens") - ChunkSize, lit(0))
          / lit(stride.toDouble)).cast("int"))
      .select(col("doc_id"), col("n_tokens"),
        posexplode(sequence(lit(0), col("n_chunks") - 1)).as(Seq("chunk_idx", "_i")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("int").as("tok_start"),
        least(col("chunk_idx") * stride + ChunkSize, col("n_tokens"))
          .cast("int").as("tok_end"))
      .withColumn("chunk_ntoks", col("tok_end") - col("tok_start"))
  }

  def qDocChunksSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  CAST(len(regexp_split_to_array(trim(text), ' +')) AS INT) AS n_tokens
       |  FROM documents),
       |n AS (SELECT doc_id, n_tokens,
       |  1 + CAST(ceil(greatest(n_tokens - ${ChunkSize}, 0) / ${ChunkSize - ChunkOverlap}.0) AS INT) AS n_chunks
       |  FROM t)
       |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       |  CAST(i * ${ChunkSize - ChunkOverlap} AS INT) AS tok_start,
       |  CAST(least(i * ${ChunkSize - ChunkOverlap} + ${ChunkSize}, n_tokens) AS INT) AS tok_end,
       |  CAST(least(i * ${ChunkSize - ChunkOverlap} + ${ChunkSize}, n_tokens)
       |    - i * ${ChunkSize - ChunkOverlap} AS INT) AS chunk_ntoks
       |FROM n, unnest(range(0, n_chunks)) AS r(i)""".stripMargin

  /** Packed-sequence length (512-8192 at prod; the corpus docs are short). */
  val PackSeqLen = 64
  /** Docs per prefix-sum bucket — the two-phase-scan dial: bucket count is
    * n/PackBucket, so the bucket-offset window stays KB-scale (set ~1e5 at
    * 100 TB for ~1e4 bucket rows per billion docs). */
  val PackBucket = 256

  /** Sequence PACKING — concat-and-chunk, the step that turns a curated
    * corpus into fixed-length training sequences (GPT-style: concatenate
    * all documents in doc_id order, cut every PackSeqLen tokens): one row
    * per (doc, training sequence) with the doc-token span [doc_from,
    * doc_to) landing at seq_from inside that sequence. Every sequence
    * except the ragged last is exactly full — zero padding waste.
    *
    * The global token offset of each doc is a prefix sum over doc order —
    * computed SCALE-SAFELY as a two-phase scan, never a single-partition
    * window over the corpus (the CLAUDE.md job-storm class): per-bucket
    * totals first (tiny frame; its running-sum window holds n/PackBucket
    * rows), then a within-bucket running sum whose window partitions are
    * bounded by PackBucket. All-integer arithmetic (DIV semantics shared
    * with the oracle), so the output is engine-exact. */
  def qDocPack(s: SparkSession, d: String): DataFrame =
    packSpans(Tables.documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok")))

  /** The packing core over any (doc_id, n_tok) relation — shared by the
    * standalone query and the flagship pipeline's packing stage. */
  def packSpans(docTok: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val C = PackSeqLen
    val docs = docTok
      // tokenless docs (null text ⇒ size −1, empty ⇒ 0) contribute nothing
      // to any sequence; without the guard Spark's sequence(a, b) with
      // b < a emits a DESCENDING run (spurious negative spans) while the
      // oracle's range() emits nothing — filter BOTH engines identically
      .filter(col("n_tok") > 0)
      .withColumn("bucket", expr(s"doc_id DIV $PackBucket"))
    val bw = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = docs.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("bsum"))
      .withColumn("boffset", coalesce(sum(col("bsum")).over(bw), lit(0L)))
      .select(col("bucket"), col("boffset"))
    val ww = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(bucketOffsets), "bucket")
      .withColumn("off", col("boffset") + coalesce(sum(col("n_tok")).over(ww), lit(0L)))
      .withColumn("seq_id", explode(sequence(
        expr(s"off DIV $C"), expr(s"(off + n_tok - 1) DIV $C"))))
      .select(col("doc_id"), col("seq_id"),
        greatest(col("seq_id") * C - col("off"), lit(0L)).as("doc_from"),
        least((col("seq_id") + 1) * C - col("off"), col("n_tok")).as("doc_to"),
        greatest(col("off") - col("seq_id") * C, lit(0L)).as("seq_from"))
  }

  def qDocPackSql: String =
    s"""WITH d0 AS (SELECT doc_id,
       |  CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_tok
       |  FROM documents),
       |d AS (SELECT * FROM d0 WHERE n_tok > 0),
       |o AS (SELECT doc_id, n_tok,
       |  CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM d)
       |SELECT doc_id, t.seq_id,
       |  greatest(t.seq_id * $PackSeqLen - off, 0) AS doc_from,
       |  least((t.seq_id + 1) * $PackSeqLen - off, n_tok) AS doc_to,
       |  greatest(off - t.seq_id * $PackSeqLen, 0) AS seq_from
       |FROM o, unnest(range(off // $PackSeqLen,
       |  (off + n_tok - 1) // $PackSeqLen + 1)) AS t(seq_id)""".stripMargin

  /** Duplicated-span gram length. */
  val SpanLen = 5

  /** SPAN-LEVEL duplication — the memorization-risk signal doc-level dedup
    * misses (cf. the "deduplicating training data" line of work: verbatim
    * spans repeated across documents are what models memorize): for every
    * doc, how many of its tokens are covered by a SpanLen-token gram that
    * also appears in ANOTHER doc. Grams are keyed by md5 (engine-common
    * for the oracle; at scale the same shape runs on xxhash64), repeated
    * grams are those in ≥2 distinct docs, and per-doc coverage is the
    * UNION of fixed-length intervals via one ordered window:
    * covered = L + Σ min(L, pos_i − pos_{i−1}). Two narrow shuffles
    * (gram groupBy + per-doc window) — no pair lists, no cross joins.
    * Output: per affected doc, span count, covered tokens, exact-ratio
    * coverage fraction. */
  def qDocDupspans(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = SpanLen
    val g = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") >= L)
      .select(col("doc_id"), col("n_tokens"), posexplode(
        expr(s"transform(sequence(0, size(toks) - $L)," +
          s" i -> concat_ws(' ', slice(toks, i + 1, $L)))")).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        md5(col("gram")).as("gkey"))
      .localCheckpoint() // fed to BOTH the dup groupBy and the hit join —
      // without it the tokenize+explode+md5 chain executes twice
    val dup = g.groupBy(col("gkey"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gkey"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    g.join(dup, "gkey")
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("add", when(col("prev").isNull, lit(L))
        .otherwise(least(lit(L), col("pos") - col("prev"))))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("add")).cast("bigint").as("covered_tokens"))
      .withColumn("dup_frac",
        col("covered_tokens").cast("double") / col("n_tokens"))
  }

  def qDocDupspansSql: String =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks FROM documents),
       |g AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       |    CAST(i - 1 AS INT) AS pos,
       |    md5(array_to_string(toks[i:i + ${SpanLen - 1}], ' ')) AS gkey
       |  FROM t, unnest(range(1, len(toks) - ${SpanLen} + 2)) AS r(i)
       |  WHERE len(toks) >= ${SpanLen}),
       |dup AS (SELECT gkey FROM g GROUP BY gkey
       |  HAVING count(DISTINCT doc_id) >= 2),
       |h AS (SELECT g.doc_id, g.n_tokens, g.pos,
       |    lag(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
       |  FROM g JOIN dup USING (gkey))
       |SELECT doc_id, n_tokens, count(*) AS n_dup_spans,
       |  CAST(sum(CASE WHEN prev IS NULL THEN ${SpanLen}
       |    ELSE least(${SpanLen}, pos - prev) END) AS BIGINT) AS covered_tokens,
       |  CAST(sum(CASE WHEN prev IS NULL THEN ${SpanLen}
       |    ELSE least(${SpanLen}, pos - prev) END) AS DOUBLE) / n_tokens AS dup_frac
       |FROM h GROUP BY doc_id, n_tokens""".stripMargin

  /** Exact-substring minimum duplicate length, in tokens (Lee et al. use
    * 50 on web-scale corpora; the gate corpus averages ~55 tokens/doc, so
    * 15 plays the same role at this scale). */
  val SubstrLen = 15

  /** EXACT-SUBSTRING dedup profile (cf. Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * method): for every doc, the maximal contiguous regions covered by a
    * substring of ≥ SubstrLen tokens that occurs ≥2 times ANYWHERE in
    * the corpus (another doc or a second position in the same doc —
    * unlike [[qDocDupspans]]' cross-doc-only 5-gram overlap). The
    * suffix-array reduction that makes this Spark-shaped: a position is
    * covered by a duplicated substring of length ≥ L iff it lies in some
    * window [p, p+L) whose L-gram occurs ≥2 times — so duplicated
    * L-grams alone reproduce ExactSubstr's coverage EXACTLY, no suffix
    * array needed, and coverage unions via the dupspans interval
    * machinery. Spans here are maximal contiguous covered regions
    * (gap > L breaks; nested/overlapping repeats union without double
    * counting). Output per affected doc: merged span count, covered
    * tokens, longest covered run, exact-ratio coverage.
    *
    * Scale shape: one scan; grams hash to md5 keys inside one generated
    * projection (the gram string is per-row temporary, never shuffled);
    * the occurrence count map-side-combines; the join back is
    * gram-key-partitioned; the island windows ride ONE (doc_id, pos)
    * sort over HIT rows only (candidate-sized, not corpus-sized). Per-doc
    * decisions, never pair lists. */
  def qDocSubstrdup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = SubstrLen
    val g = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") >= L)
      .select(col("doc_id"), col("n_tokens"), posexplode(
        expr(s"transform(sequence(0, size(toks) - $L)," +
          s" i -> concat_ws(' ', slice(toks, i + 1, $L)))")).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        md5(col("gram")).as("gkey"))
      .localCheckpoint() // fed to BOTH the occurrence count and the hit
      // join — without it the tokenize+explode+md5 chain runs twice
    val dup = g.groupBy(col("gkey"))
      .agg(count(lit(1)).as("nocc"))
      .filter(col("nocc") >= 2) // total occurrences, NOT distinct docs:
      // a second position in the same doc duplicates too (ExactSubstr)
      .select(col("gkey"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    g.join(dup, "gkey")
      .withColumn("brk",
        when(coalesce(col("pos") - lag(col("pos"), 1).over(w),
          lit(L + 1)) > L, lit(1)).otherwise(lit(0)))
      .withColumn("island", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg((max(col("pos")) + lit(L) - min(col("pos"))).as("span_len"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(sum(col("span_len")).cast("bigint").as("dup_tokens"),
        count(lit(1)).as("n_spans"),
        max(col("span_len")).cast("bigint").as("longest_span"))
      .withColumn("dup_frac",
        col("dup_tokens").cast("double") / col("n_tokens"))
  }

  def qDocSubstrdupSql: String = {
    val L = SubstrLen
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks FROM documents),
       |g AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       |    CAST(i - 1 AS INT) AS pos,
       |    md5(array_to_string(toks[i:i + ${L - 1}], ' ')) AS gkey
       |  FROM t, unnest(range(1, len(toks) - $L + 2)) AS r(i)
       |  WHERE len(toks) >= $L),
       |dup AS (SELECT gkey FROM g GROUP BY gkey HAVING count(*) >= 2),
       |h AS (SELECT g.doc_id, g.n_tokens, g.pos,
       |    lag(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
       |  FROM g JOIN dup USING (gkey)),
       |i AS (SELECT doc_id, n_tokens, pos,
       |    CAST(SUM(CASE WHEN prev IS NULL OR pos - prev > $L THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
       |  FROM h),
       |s AS (SELECT doc_id, n_tokens, island, max(pos) + $L - min(pos) AS span_len
       |  FROM i GROUP BY doc_id, n_tokens, island)
       |SELECT doc_id, n_tokens, CAST(sum(span_len) AS BIGINT) AS dup_tokens,
       |  CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(max(span_len) AS BIGINT) AS longest_span,
       |  CAST(sum(span_len) AS DOUBLE) / n_tokens AS dup_frac
       |FROM s GROUP BY doc_id, n_tokens""".stripMargin
  }

  /** EXACT-SUBSTRING REMOVAL — [[qDocSubstrdup]]'s rewrite half, the
    * operator Lee et al. 2022 actually run (ExactSubstr REMOVES all but
    * one occurrence of every duplicated substring, it does not just
    * report them): for each duplicated L-gram, the corpus-FIRST
    * occurrence (min (doc_id, pos)) is canonical; a token position is
    * excised iff some non-canonical duplicated window covers it and no
    * canonical window does. Later copies of a duplicated run vanish,
    * the earliest copy survives verbatim, and a verbatim whole-doc
    * duplicate cleans to the EMPTY string (exact dedup of later copies
    * falls out as a special case). Output per doc: token counts and
    * md5(cleaned text) — the cross-engine redaction-hash discipline
    * (q_doc_pii), so the oracle checks the ACTUAL rewrite.
    *
    * Scale shape: one gram build (the substrdup projection) feeds ONE
    * gkey-partitioned window pass (row_number picks canonicals, a
    * partition count marks duplicates — same exchange); excised
    * positions explode only from DUPLICATED windows (candidate-sized
    * ×L); and the REWRITE is blast-radius-bounded — docs with no
    * removal pass through a narrow md5 projection untouched, only
    * AFFECTED docs pay the token-explode + anti-join + re-aggregate
    * (the updateWhere carry/delta discipline applied to text). */
  def qDocSubstrclean(s: SparkSession, d: String): DataFrame =
    substrClean(Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** Core of [[qDocSubstrclean]] over ANY (doc_id, text) relation — the
    * pipeline composition cleans the SURVIVOR set (span cleaning ranks
    * after doc-level dedup, the published order). */
  private[graft] def substrClean(docsIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = SubstrLen
    val docs = docsIn
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .localCheckpoint() // feeds the gram build AND both rewrite arms
    val g = docs
      .filter(col("n_tokens") >= L)
      .select(col("doc_id"), posexplode(
        expr(s"transform(sequence(0, size(toks) - $L)," +
          s" i -> concat_ws(' ', slice(toks, i + 1, $L)))")).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("gkey"))
    val wOrd = Window.partitionBy(col("gkey"))
      .orderBy(col("doc_id"), col("pos"))
    val occ = g
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("gkey"))))
      .filter(col("cnt") >= 2)
      .localCheckpoint() // candidate-sized; feeds both position explodes
    def positions(df: DataFrame) = df
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + L - 1)).as("i"))
      .distinct()
    val removed = positions(occ.filter(col("rk") > 1))
      .join(positions(occ.filter(col("rk") === 1)), Seq("doc_id", "i"),
        "left_anti")
      .localCheckpoint() // feeds the affected-doc set AND the anti-join
    val affected = removed.select(col("doc_id")).distinct()
    // untouched docs: narrow pass-through (no explode, no shuffle beyond
    // the anti-join probe) — the blast-radius arm
    val untouched = docs.join(affected, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"),
        lit(0L).as("n_removed"), col("n_tokens").cast("long").as("n_kept"),
        md5(concat_ws(" ", col("toks"))).as("clean_md5"))
    val rewritten = docs.join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("n_tokens"),
        posexplode(col("toks")).as(Seq("i", "tok")))
      .join(removed, Seq("doc_id", "i"), "left_anti")
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("i"), col("tok")))),
          e => e.getField("tok"))).as("clean"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("n_kept")).cast("long").as("n_removed"),
        col("n_kept"), md5(col("clean")).as("clean_md5"))
    // a FULLY-removed doc drops out of the re-aggregate — restore it as
    // an empty-string row (the exact-duplicate collapse case)
    val emptied = docs.join(affected, Seq("doc_id"), "left_semi")
      .join(rewritten.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"),
        col("n_tokens").cast("long").as("n_removed"), lit(0L).as("n_kept"),
        md5(lit("")).as("clean_md5"))
    untouched.unionByName(rewritten).unionByName(emptied)
  }

  def qDocSubstrcleanSql: String = {
    val L = SubstrLen
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks FROM documents),
       |d AS (SELECT doc_id, toks, CAST(len(toks) AS INT) AS n_tokens FROM t),
       |g AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       |    md5(array_to_string(toks[i:i + ${L - 1}], ' ')) AS gkey
       |  FROM d, unnest(range(1, len(toks) - $L + 2)) AS r(i)
       |  WHERE n_tokens >= $L),
       |o AS (SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY gkey ORDER BY doc_id, pos) AS rk,
       |    count(*) OVER (PARTITION BY gkey) AS cnt
       |  FROM g),
       |rempos AS (SELECT DISTINCT doc_id, pos + u.i AS i
       |  FROM o, unnest(range(0, $L)) AS u(i) WHERE cnt >= 2 AND rk > 1),
       |canpos AS (SELECT DISTINCT doc_id, pos + u.i AS i
       |  FROM o, unnest(range(0, $L)) AS u(i) WHERE cnt >= 2 AND rk = 1),
       |removed AS (SELECT doc_id, i FROM rempos
       |  ANTI JOIN canpos USING (doc_id, i)),
       |affected AS (SELECT DISTINCT doc_id FROM removed),
       |untouched AS (
       |  SELECT doc_id, n_tokens, CAST(0 AS BIGINT) AS n_removed,
       |    CAST(n_tokens AS BIGINT) AS n_kept,
       |    md5(array_to_string(toks, ' ')) AS clean_md5
       |  FROM d ANTI JOIN affected USING (doc_id)),
       |toksx AS (
       |  SELECT d.doc_id, d.n_tokens, CAST(u.i - 1 AS INT) AS i,
       |    toks[u.i] AS tok
       |  FROM d SEMI JOIN affected USING (doc_id),
       |    unnest(range(1, len(toks) + 1)) AS u(i)),
       |kept AS (SELECT * FROM toksx ANTI JOIN removed USING (doc_id, i)),
       |rewritten AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(n_tokens - count(*) AS BIGINT) AS n_removed,
       |    CAST(count(*) AS BIGINT) AS n_kept,
       |    md5(string_agg(tok, ' ' ORDER BY i)) AS clean_md5
       |  FROM kept GROUP BY doc_id, n_tokens),
       |emptied AS (
       |  SELECT doc_id, n_tokens, CAST(n_tokens AS BIGINT) AS n_removed,
       |    CAST(0 AS BIGINT) AS n_kept, md5('') AS clean_md5
       |  FROM d SEMI JOIN affected USING (doc_id)
       |  ANTI JOIN rewritten USING (doc_id))
       |SELECT * FROM untouched UNION ALL
       |SELECT * FROM rewritten UNION ALL
       |SELECT * FROM emptied""".stripMargin
  }

  /** Winnowing gram length (k) and window size (w), in tokens/grams. */
  val WinnowK = 4
  val WinnowW = 4

  /** WINNOWING fingerprint selection (Schleimer, Wilkerson & Aiken 2003
    * — the MOSS algorithm, the position-robust document-fingerprinting
    * standard): over each doc's k-gram hash sequence, select the minimum
    * hash of every length-w window; the selected set is the document's
    * fingerprint, guaranteed to share entries with any doc overlapping
    * by ≥ w+k−1 tokens, at expected density 2/(w+1). The selection is
    * computed by the nearest-smaller-distance characterization — with
    * distinct hashes, position p is a window minimum for SOME window iff
    *   a + b > w,  a/b = distance to the nearest smaller hash on the
    * left/right capped at w —
    * which for small w is a fixed fan of lag/lead comparisons, identical
    * in both engines (md5 hex strings compare bytewise; ties, measure-
    * zero under md5, resolve by the same comparisons on both sides).
    * Output per doc: gram count, selected-fingerprint count, exact-ratio
    * density, and md5 over the ordered (pos:hash) fingerprint list — the
    * digest discipline, so the oracle checks the ACTUAL selected set.
    *
    * Scale: one narrow gram pass; ONE per-doc window sort shared by all
    * 2(w−1) lag/lead comparisons; a per-doc re-aggregate. Nothing
    * corpus-sized shuffles twice, no joins. */
  def qDocWinnow(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (k, w) = (WinnowK, WinnowW)
    val g = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(
        expr(s"transform(sequence(0, size(toks) - $k)," +
          s" i -> concat_ws(' ', slice(toks, i + 1, $k)))")).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def dist(off: Int => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (1 until w).foldRight(lit(w)) { (i, rest) =>
        when(off(i) < col("h"), lit(i)).otherwise(rest)
      }
    g.withColumn("a", dist(i => lag(col("h"), i).over(win)))
      .withColumn("b", dist(i => lead(col("h"), i).over(win)))
      .withColumn("sel", col("a") + col("b") > w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("sel"), 1L).otherwise(0L)).as("n_selected"),
        md5(concat_ws("|", transform(
          array_sort(collect_list(when(col("sel"),
            struct(col("pos"), col("h"))))),
          e => concat(e.getField("pos").cast("string"), lit(":"),
            e.getField("h"))))).as("fp_md5"))
      .select(col("doc_id"), col("n_grams"), col("n_selected"),
        (col("n_selected").cast("double") / col("n_grams")).as("density"),
        col("fp_md5"))
  }

  def qDocWinnowSql: String = {
    val (k, w) = (WinnowK, WinnowW)
    def dist(fn: String): String =
      (1 until w).map(i =>
        s"WHEN $fn(h, $i) OVER win < h THEN $i").mkString(
        "CASE ", " ", s" ELSE $w END")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks FROM documents),
       |g AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       |    md5(array_to_string(toks[i:i + ${k - 1}], ' ')) AS h
       |  FROM t, unnest(range(1, len(toks) - $k + 2)) AS r(i)
       |  WHERE len(toks) >= $k),
       |d AS (SELECT doc_id, pos, h,
       |    ${dist("lag")} AS a,
       |    ${dist("lead")} AS b
       |  FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY pos))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN a + b > $w THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_selected,
       |  CAST(sum(CASE WHEN a + b > $w THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) AS density,
       |  md5(string_agg(CASE WHEN a + b > $w
       |      THEN pos || ':' || h END, '|' ORDER BY pos)) AS fp_md5
       |FROM d GROUP BY doc_id""".stripMargin
  }

  /** 64-bit document fingerprints — the cheap dup keys a pipeline persists
    * per shard: an exact-dup key (xxHash64 of normalized text) plus a
    * winnowing-style rolling-hash fingerprint (native codegen expression,
    * robust to local edits). Rows-only check (hashes are engine-specific). */
  def qDocFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), xxhash64(trim(col("text"))).as("fingerprint"),
        graft.functions.GraftFunctions.rollingFingerprint(trim(col("text")))
          .as("rolling_fp"),
        col("source"))

  /** CORPUS-TYPICALITY score — the statistical-LM quality-filter proxy
    * (the perplexity-filter shape without a trained model): score each
    * document by the mean GLOBAL frequency of its character trigrams.
    * Machine-generated / garbled text carries rare trigram mass and
    * scores low; boilerplate scores high — the same signal a KenLM-style
    * char-LM perplexity filter thresholds on, kept EXACT so both engines
    * hash-agree: per-doc popularity is a sum of BIGINT global counts
    * (order-free), the score one division of two exact integers cast
    * double (IEEE-identical on identical operands) — never a sum of
    * per-trigram log-probs whose float order would diverge.
    *
    * Spark-first: trigrams explode in-place (char `substr` over a
    * `sequence`, codegen'd — no UDF); the global count relation is
    * BOUNDED by the trigram alphabet (≤ 128³ for ASCII — broadcastable
    * at any corpus size, AQE size-drives it, no hint); the per-doc
    * re-aggregation map-side-combines the exploded rows back to one row
    * per doc before its shuffle. Two passes over text, zero corpus-sized
    * shuffles beyond the count build. */
  def qDocTypicality(s: SparkSession, d: String): DataFrame = {
    val tris = Tables.documentsWide(s, d) // r17: scan-width guard
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), length(col("text")) - 2),
          i => col("text").substr(i, lit(3)))).as("g"))
    val counts = tris.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    tris.join(counts, "g")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("long").as("popularity"),
        count(lit(1)).as("n_trigrams"))
      .select(col("doc_id"), col("n_trigrams"), col("popularity"),
        (col("popularity").cast("double") / col("n_trigrams"))
          .as("typicality"))
  }

  /** UNIGRAM-ENTROPY quality signal (the Gopher-family diversity
    * measure: repetitive/templated text carries low token-distribution
    * entropy, gibberish with a flat distribution carries high) — per
    * doc, H = ln n − (1/n)·Σ c·ln c over token counts c, kept
    * cross-engine EXACT via the DSIR quantized-log discipline
    * (Sampling.qDocDsir): each ln evaluates on a SMALL INTEGER (a count
    * ≤ doc length) and quantizes ONCE to L(x) = floor(1e6·ln x), so the
    * per-doc score H_scaled = n·L(n) − Σ c·L(c) is an exact BIGINT sum
    * (a divergence needs 1e6·ln(int) within ~5e-10 of an integer grid
    * line; ln 1 = 0 is exact in both engines) and the one output double
    * is a division of exactly-represented integers.
    *
    * Scale: explode → (doc, token) counts (map-side combined) → per-doc
    * re-aggregation carrying only (doc_id, longs). Two narrow shuffles,
    * no joins, no text past the first projection. */
  /** READABILITY (Flesch–Kincaid grade, Kincaid et al. 1975 — the
    * document-difficulty score quality-curation recipes bucket corpora
    * by): grade = 0.39·W/S + 11.8·Y/W − 15.59 with W words, S sentences
    * (floored at 1 — prose without enders is one sentence), Y syllables
    * under the standard vowel-group heuristic (runs of [aeiouy] count
    * one syllable; a consonant-only token still counts 1 — the per-word
    * min). Exactness: every count is an exact integer, the grade
    * collapses over the common denominator 100·S·W to ONE ratio of
    * BIGINTs — num = 39·W² + 1180·Y·S − 1559·S·W, den = 100·S·W — and
    * the reported double is a single correctly-rounded IEEE division of
    * exactly-represented integers (both engines bit-identical; no libm
    * anywhere — the ratio-of-counts class, strictly stronger than the
    * quantized-log grid).
    *
    * Scale: ONE narrow projection per doc (regex counts + a token-list
    * filter), no shuffle, no joins — the cheapest possible per-doc
    * quality signal at any corpus size. */
  def qDocReadability(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .filter(col("n_words") > 0)
      .withColumn("n_sentences", greatest(lit(1L),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
          .cast("long")))
      .withColumn("n_syllables",
        (size(regexp_extract_all(col("text"), lit("[aeiouy]+"), lit(0)))
          + size(filter(col("toks"),
              t => t.rlike("^[^aeiouy]+$")))).cast("long"))
      .withColumn("fk_num",
        lit(39L) * col("n_words") * col("n_words")
          + lit(1180L) * col("n_syllables") * col("n_sentences")
          - lit(1559L) * col("n_sentences") * col("n_words"))
      .withColumn("fk_den", lit(100L) * col("n_sentences") * col("n_words"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"), col("fk_num"), col("fk_den"),
        (col("fk_num").cast("double") / col("fk_den").cast("double"))
          .as("fk_grade"))

  def qDocReadabilitySql: String =
    """SELECT doc_id, n_words, n_sentences, n_syllables, fk_num, fk_den,
      |  CAST(fk_num AS DOUBLE) / CAST(fk_den AS DOUBLE) AS fk_grade
      |FROM (
      |  SELECT doc_id, n_words, n_sentences, n_syllables,
      |    39 * n_words * n_words + 1180 * n_syllables * n_sentences
      |      - 1559 * n_sentences * n_words AS fk_num,
      |    100 * n_sentences * n_words AS fk_den
      |  FROM (
      |    SELECT doc_id,
      |      CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT)
      |        AS n_words,
      |      greatest(CAST(1 AS BIGINT),
      |        CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
      |        AS n_sentences,
      |      CAST(len(regexp_extract_all(text, '[aeiouy]+'))
      |        + len(list_filter(regexp_split_to_array(trim(text), ' +'),
      |            t -> regexp_matches(t, '^[^aeiouy]+$'))) AS BIGINT)
      |        AS n_syllables
      |    FROM documents) c
      |  WHERE n_words > 0) f""".stripMargin

  def qDocEntropy(s: SparkSession, d: String): DataFrame = {
    def lq(c: org.apache.spark.sql.Column) =
      floor(lit(1e6) * log(c.cast("double"))).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * lq(col("c"))).cast("long").as("sc"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        ((col("n_tokens") * lq(col("n_tokens")) - col("sc")).cast("double")
          / (col("n_tokens") * lit(1000000L)).cast("double"))
          .as("entropy"))
  }

  def qDocEntropySql: String =
    """WITH c AS (
      |  SELECT doc_id, u.tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks
      |        FROM documents) t, unnest(toks) AS u(tok)
      |  GROUP BY doc_id, u.tok),
      |a AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_distinct,
      |    CAST(sum(c * CAST(floor(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT))
      |      AS BIGINT) AS sc
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_distinct,
      |  CAST(n_tokens * CAST(floor(1e6 * ln(CAST(n_tokens AS DOUBLE)))
      |      AS BIGINT) - sc AS DOUBLE)
      |    / CAST(n_tokens * 1000000 AS DOUBLE) AS entropy
      |FROM a""".stripMargin

  /** PER-SOURCE KL DIVERGENCE to the corpus unigram distribution — the
    * data-mix drift report (which sources' token distributions sit
    * farthest from the pooled corpus — the quantity DoReMi-class domain
    * reweighting and CCNet-class source triage rank on; a source whose
    * KL jumps between crawls changed character). KL(P_s ‖ P) =
    * Σ_w (c_sw/n_s)·ln((c_sw·N)/(n_s·c_w)) — absolutely continuous by
    * construction (every source token occurs in the corpus), kept
    * cross-engine EXACT on the 1e6 quantized-log grid: the n_s-scaled
    * sum Σ_w c_sw·(L(c_sw) − L(n_s) − L(c_w) + L(N)) with
    * L(x) = floor(1e6·ln x) over INTEGER counts is an exact
    * DECIMAL(38,0)/HUGEINT sum (the q_doc_entropy discipline, termwise
    * over four single-ln grid values — divergence needs 1e6·ln(int)
    * within ~5e-10 of a grid line), and the report divides once by n_s
    * with DIV/​// truncation-toward-zero (identical both engines; grid
    * floors can leave a slightly negative sum on an identical
    * distribution — a report property, documented, same in both
    * engines). Width: |term| ≤ c_sw·1.3e8, so the per-source sum is
    * inside 38 digits to ~1e28 tokens.
    *
    * Scale shape: ONE (source, tok) count aggregation (map-side
    * combined, vocabulary×sources-bounded) materialized once and
    * feeding corpus counts, source totals, and the term join; the only
    * data-scaled exchange is that first count. The tok join is
    * vocabulary-bounded and hint-free; source totals broadcast. */
  def qDocKldiv(s: SparkSession, d: String): DataFrame = {
    def lq(c: Column): Column =
      floor(lit(1e6) * log(c.cast("double"))).cast("long")
    val sc = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cs"))
      .localCheckpoint() // vocab×sources-bounded; feeds all three uses
    val cw = sc.groupBy(col("tok"))
      .agg(sum(col("cs")).cast("long").as("cw"))
    val tot = sc.groupBy(col("source"))
      .agg(sum(col("cs")).cast("long").as("ns"),
        count(lit(1)).as("n_distinct"))
    val n = sc.agg(sum(col("cs")).cast("long").as("n"))
    sc.join(cw, "tok")
      .join(broadcast(tot), "source")
      .crossJoin(broadcast(n))
      .select(col("source"), col("ns"), col("n_distinct"),
        (col("cs").cast("decimal(38,0)") *
          (lq(col("cs")) - lq(col("ns")) - lq(col("cw")) + lq(col("n"))))
          .as("t"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"),
        sum(col("t")).as("ts"))
      .withColumn("kl_scaled",
        expr("CAST(ts DIV CAST(n_tokens AS DECIMAL(38,0)) AS BIGINT)"))
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        col("kl_scaled"),
        (col("kl_scaled").cast("double") / 1000000.0).as("kl"))
  }

  def qDocKldivSql: String =
    """WITH c AS (
      |  SELECT source, u.tok, CAST(count(*) AS BIGINT) AS cs
      |  FROM (SELECT source, regexp_split_to_array(trim(text), ' +') AS toks
      |        FROM documents) t, unnest(toks) AS u(tok)
      |  GROUP BY source, u.tok),
      |cw AS (SELECT tok, CAST(sum(cs) AS BIGINT) AS cw FROM c GROUP BY tok),
      |tot AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns,
      |    CAST(count(*) AS BIGINT) AS n_distinct
      |  FROM c GROUP BY source),
      |n AS (SELECT CAST(sum(cs) AS BIGINT) AS n FROM c),
      |t AS (
      |  SELECT c.source, tot.ns, tot.n_distinct,
      |    CAST(c.cs AS HUGEINT) * (
      |      CAST(floor(1e6 * ln(CAST(c.cs AS DOUBLE))) AS BIGINT)
      |      - CAST(floor(1e6 * ln(CAST(tot.ns AS DOUBLE))) AS BIGINT)
      |      - CAST(floor(1e6 * ln(CAST(cw.cw AS DOUBLE))) AS BIGINT)
      |      + CAST(floor(1e6 * ln(CAST(n.n AS DOUBLE))) AS BIGINT)) AS t
      |  FROM c JOIN cw USING (tok) JOIN tot USING (source) CROSS JOIN n),
      |a AS (SELECT source, max(ns) AS n_tokens,
      |    max(n_distinct) AS n_distinct, sum(t) AS ts
      |  FROM t GROUP BY source)
      |SELECT source, n_tokens, n_distinct,
      |  CAST(ts // CAST(n_tokens AS HUGEINT) AS BIGINT) AS kl_scaled,
      |  CAST(CAST(ts // CAST(n_tokens AS HUGEINT) AS BIGINT) AS DOUBLE)
      |    / CAST(1000000 AS DOUBLE) AS kl
      |FROM a""".stripMargin

  /** Top ranks used for the Zipf slope fit (bounded by construction). */
  val ZipfK = 100

  /** ZIPF / VOCABULARY REPORT (Zipf 1949; the corpus-statistics card —
    * natural language shows rank-frequency slope ≈ −1 on log-log axes,
    * and the vocabulary/hapax profile diagnoses templated or truncated
    * corpora): corpus token count, vocabulary size, hapax-legomenon
    * count, and the OLS log-log slope over the top-[[ZipfK]] ranks.
    * Exactness: ranks and frequencies are integers, so x = L(rank) and
    * y = L(freq) quantize once on the 1e6 ln-grid (≤ K + K distinct
    * bounded-integer ln calls), the OLS numerator K·Σxy − Σx·Σy and
    * denominator K·Σx² − (Σx)² are exact BIGINT sums, and the slope
    * reports as the integer floor (1e6·num) DIV den (DECIMAL(38,0)/
    * HUGEINT product, both engines truncate toward zero).
    *
    * Scale shape: one token-count aggregate (vocabulary-bounded), a
    * bounded TakeOrdered top-K, a rank window over those K rows only,
    * one K-row fold; the stats aggregate is 1 row. */
  def qDocZipf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lq(c: Column): Column =
      floor(lit(1e6) * log(c.cast("double"))).cast("long")
    val counts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // vocabulary-bounded; feeds stats + the top-K
    val stats = counts.agg(
      sum(col("c")).cast("long").as("n_tokens"),
      count(lit(1)).as("vocab_size"),
      count(when(col("c") === 1, 1)).as("hapax_count"))
    val top = counts.orderBy(col("c").desc, col("tok")).limit(ZipfK)
      .withColumn("rank", row_number().over( // bounded: ≤ K rows
        Window.orderBy(col("c").desc, col("tok"))).cast("long"))
      .select(lq(col("rank")).as("x"), lq(col("c")).as("y"))
    val fit = top.agg(
      count(lit(1)).as("k"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      .select(col("k"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * (k * sxy - sx * sy)" +
          " DIV (CAST(k AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0))" +
          " * sx) AS BIGINT)").as("slope_scaled"))
    stats.crossJoin(fit)
      .select(col("n_tokens"), col("vocab_size"), col("hapax_count"),
        col("k"), col("slope_scaled"),
        (col("slope_scaled").cast("double") / lit(1000000.0)).as("slope"))
  }

  def qDocZipfSql: String =
    s"""WITH counts AS MATERIALIZED (
       |  SELECT u.tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT regexp_split_to_array(trim(text), ' +') AS t
       |        FROM documents) x, unnest(t) AS u(tok)
       |  GROUP BY u.tok
       |), stats AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS vocab_size,
       |    CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT)
       |      AS hapax_count
       |  FROM counts
       |), top AS (
       |  SELECT CAST(floor(1e6 * ln(CAST(rank AS DOUBLE))) AS BIGINT) AS x,
       |    CAST(floor(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS y
       |  FROM (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank
       |        FROM counts ORDER BY c DESC, tok LIMIT $ZipfK) z
       |), fit AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM top
       |)
       |SELECT n_tokens, vocab_size, hapax_count, k,
       |  CAST(CAST(1000000 AS HUGEINT) * (k * sxy - sx * sy)
       |    // (CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
       |    AS BIGINT) AS slope_scaled,
       |  CAST(CAST(CAST(1000000 AS HUGEINT) * (k * sxy - sx * sy)
       |    // (CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
       |    AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS slope
       |FROM stats CROSS JOIN fit""".stripMargin

  /** Corpus GINI COEFFICIENT [oracle] — inequality of the token
    * frequency distribution (a uniform word soup sits near 0, a
    * boilerplate-dominated crawl climbs toward 1 — the concentration
    * twin of the Zipf slope; cf. Gini 1912 / the Lorenz-curve form).
    * Exact cross-engine via the RUN-LENGTH closed form (the q_evt_mad
    * doubled-order-statistic discipline, generalized): with type counts
    * sorted ascending, Gini = Σᵢ (2i − n − 1)·cᵢ / (n·Σc); a run of m
    * types sharing count c occupying ranks a+1..a+m contributes
    * c·m·(2a + m − n) — an arithmetic-series collapse, so the rank sum
    * needs only the DISTINCT count values with multiplicities and a
    * running-sum window over them (distinct-value-bounded, never a
    * corpus or vocab sort). gini_scaled = ⌊10⁶·num⌋ DIV (n·S) is an
    * exact integer floor of an exact rational — no libm anywhere.
    *
    * Scale shape: one vocab-bounded groupBy(tok), then a
    * DISTINCT-COUNT-VALUE-bounded relation (≤ thousands of rows at any
    * corpus size — counts repeat massively) through the unpartitioned
    * running-sum window (bounded input, the documented exception), one
    * 1-row cross join. */
  def qDocGini(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val runs = counts.groupBy(col("c")).agg(count(lit(1)).as("m"))
    val cum = runs.withColumn("a",
      coalesce(sum(col("m")).over(Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = runs.agg(
      sum(col("m")).cast("long").as("n_types"),
      sum(col("c") * col("m")).cast("long").as("n_tokens"))
    cum.crossJoin(tot)
      .agg(first(col("n_types")).as("n_types"),
        first(col("n_tokens")).as("n_tokens"),
        sum(col("c").cast("decimal(38,0)") * col("m")
          * (lit(2) * col("a") + col("m") - col("n_types")))
          .as("num"))
      .select(col("n_types"), col("n_tokens"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * num DIV " +
          "(CAST(n_types AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
          .as("gini_scaled"))
      .withColumn("gini",
        col("gini_scaled").cast("double") / lit(1000000.0))
  }

  def qDocGiniSql: String =
    """WITH counts AS MATERIALIZED (
      |  SELECT u.tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT regexp_split_to_array(trim(text), ' +') AS t
      |        FROM documents) x, unnest(t) AS u(tok)
      |  GROUP BY u.tok
      |), runs AS MATERIALIZED (
      |  SELECT c, CAST(count(*) AS BIGINT) AS m FROM counts GROUP BY c
      |), cum AS (
      |  SELECT c, m, COALESCE(sum(m) OVER (ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a
      |  FROM runs
      |), tot AS (
      |  SELECT CAST(sum(m) AS BIGINT) AS n_types,
      |    CAST(sum(c * m) AS BIGINT) AS n_tokens FROM runs
      |)
      |SELECT n_types, n_tokens,
      |  CAST(CAST(1000000 AS HUGEINT)
      |    * sum(CAST(c AS HUGEINT) * m * (2 * a + m - n_types))
      |    // (CAST(n_types AS HUGEINT) * n_tokens) AS BIGINT)
      |    AS gini_scaled,
      |  CAST(CAST(CAST(1000000 AS HUGEINT)
      |    * sum(CAST(c AS HUGEINT) * m * (2 * a + m - n_types))
      |    // (CAST(n_types AS HUGEINT) * n_tokens) AS BIGINT) AS DOUBLE)
      |    / CAST(1000000 AS DOUBLE) AS gini
      |FROM cum CROSS JOIN tot
      |GROUP BY n_types, n_tokens""".stripMargin

  /** YULE'S K [oracle] — the classic per-document lexical-repetition
    * characteristic (Yule 1944; the "vocabulary richness" measure
    * stylometry and corpus-quality pipelines still run because it is
    * length-robust): K = C·(Σ_types c² − N)/N² over a doc's token
    * counts c (N tokens; C = 10⁴ in the literature — reported here as
    * k_scaled = ⌊10⁶·(S₂−N)⌋ DIV N², a pure ratio of counts, exact in
    * both engines with zero libm). High K = repetitive/boilerplate;
    * the uniform word soup sits low. The oracle-able companion to the
    * sequential-fold [[qDocMtld]] (whose DuckDB replay crashes — see
    * its scaladoc).
    *
    * Scale shape: one corpus-wide groupBy (doc_id, tok) then a per-doc
    * aggregate — two exchanges on data-scaled keys, partial-agg
    * friendly, no windows, no joins. */
  def qDocYule(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).cast("long").as("s2"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * (s2 - n_tokens) " +
          "DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
          .as("k_scaled"))
      .withColumn("yule_k",
        col("k_scaled").cast("double") / lit(1000000.0))
      .orderBy(col("doc_id"))

  def qDocYuleSql: String =
    """WITH c AS MATERIALIZED (
      |  SELECT doc_id, u.tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id,
      |          regexp_split_to_array(trim(text), ' +') AS t
      |        FROM documents) x, unnest(t) AS u(tok)
      |  GROUP BY doc_id, u.tok
      |), a AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM c GROUP BY doc_id
      |)
      |SELECT doc_id, n_tokens, n_types,
      |  CAST(CAST(1000000 AS HUGEINT) * (s2 - n_tokens)
      |    // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
      |    AS k_scaled,
      |  CAST(CAST(CAST(1000000 AS HUGEINT) * (s2 - n_tokens)
      |    // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
      |    AS DOUBLE) / CAST(1000000 AS DOUBLE) AS yule_k
      |FROM a
      |ORDER BY doc_id""".stripMargin

  /** MTLD LEXICAL DIVERSITY [rows] — McCarthy & Jarvis 2010's
    * Measure of Textual Lexical Diversity, the length-robust TTR
    * replacement corpus-quality pipelines bucket docs by (repetitive
    * boilerplate scores low, varied prose high). Forward-pass form
    * (declared; the published measure averages forward+backward — v1
    * keeps the single pass both engines replay identically): scan
    * tokens left→right, close a factor whenever the running factor's
    * type-token ratio drops below 0.72 (exact integer comparison
    * 100·types < 72·tokens — the threshold never divides), then
    * MTLD = N / (F + (1−TTR_rem)/0.28) which collapses to the pure
    * integer ratio 28·N·c_r / (28·c_r·F + 100·(c_r − ty_r)) over the
    * remainder's token count c_r and type count ty_r — so
    * mtld_scaled = ⌊10⁶·MTLD⌋ is exact. Degenerate classes (both
    * engines, by CASE): empty remainder → N/F; no completed factor AND
    * all-distinct remainder → NULL (undefined per the paper).
    * [rows], not [oracle]: DuckDB 1.0 SEGFAULTS extracting struct
    * fields from a list_reduce result at ≥~100 rows (bisected: the
    * fold itself evaluates — count(*) over it is fine — but selecting
    * st.f/st.cnt crashes the process; list_prepend hits a second,
    * binder-level crash). A segfaulting oracle would take down the
    * driver's whole gate run, so correctness is pinned by
    * TextOpsSpec's exact Scala replay of the integer fold instead
    * (same transitions, planted degenerate classes).
    *
    * Scale shape: zero shuffles, zero joins — one narrow projection
    * whose per-row state is the current factor's type set (bounded by
    * the 0.72 rule: the set can't exceed ~3.6× its token count before
    * closing... it CAN grow while TTR ≥ 0.72, i.e. up to the doc's
    * distinct-type count for highly diverse docs — doc-bounded, the
    * same bound tokenization itself carries). */
  def qDocMtld(s: SparkSession, d: String): DataFrame = {
    val mtldFold =
      """aggregate(toks,
        |  named_struct('f', CAST(0 AS BIGINT), 'cnt', CAST(0 AS BIGINT),
        |    'cur', CAST(array() AS ARRAY<STRING>)),
        |  (acc, t) -> CASE
        |    WHEN 100 * size(CASE WHEN array_contains(acc.cur, t)
        |        THEN acc.cur ELSE array_append(acc.cur, t) END)
        |      < 72 * (acc.cnt + 1)
        |    THEN named_struct('f', acc.f + CAST(1 AS BIGINT),
        |      'cnt', CAST(0 AS BIGINT),
        |      'cur', CAST(array() AS ARRAY<STRING>))
        |    ELSE named_struct('f', acc.f, 'cnt', acc.cnt + 1,
        |      'cur', CASE WHEN array_contains(acc.cur, t)
        |        THEN acc.cur ELSE array_append(acc.cur, t) END)
        |  END)""".stripMargin
    Tables.documentsWide(s, d) // r17: scan-width guard (per-token fold)
      .withColumn("toks", tokens(col("text")))
      .withColumn("st", expr(mtldFold))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        col("st.f").as("factors"),
        col("st.cnt").as("cr"), size(col("st.cur")).cast("long").as("tyr"))
      .withColumn("mtld_scaled", expr(
        """CASE
          |  WHEN cr = 0 AND factors > 0
          |    THEN CAST(1000000 AS BIGINT) * n_tokens DIV factors
          |  WHEN 28 * cr * factors + 100 * (cr - tyr) > 0
          |    THEN CAST(1000000 AS BIGINT) * 28 * n_tokens * cr
          |      DIV (28 * cr * factors + 100 * (cr - tyr))
          |  ELSE CAST(NULL AS BIGINT)
          |END""".stripMargin))
      .select(col("doc_id"), col("n_tokens"), col("factors"),
        col("mtld_scaled"),
        (col("mtld_scaled").cast("double") / lit(1000000.0)).as("mtld"))
      .orderBy(col("doc_id"))
  }


  /** COMPRESSIBILITY quality signal [rows] — the deflate-ratio filter
    * (repetitive/templated text compresses far below natural prose;
    * random gibberish barely compresses — the cheap two-sided quality
    * gate published web-corpus pipelines run next to the Gopher rules):
    * per doc, UTF-8 byte count, deflate(level 6) byte count, and the
    * exact-ratio double. Engine-specific (no SQL deflate exists) →
    * [rows] + spec; DETERMINISTIC for a given zlib (fixed level, fixed
    * strategy, one-shot input), so re-runs and partitionings agree.
    *
    * Scale shape: one NARROW typed map (text in, three numbers out — no
    * shuffle until the caller aggregates); a per-partition Deflater is
    * reset per row, never reallocated. */
  def qDocCompress(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(6, false)
        // Release native zlib memory at task end — GC finalization is
        // too late on long-lived executors (advisor r14 fix).
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => defl.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          defl.reset()
          defl.setInput(bytes)
          defl.finish()
          var n = 0L
          while (!defl.finished()) n += defl.deflate(buf)
          (id, bytes.length.toLong, n)
        }
      }
      .toDF("doc_id", "n_bytes", "n_deflate")
      .withColumn("ratio",
        when(col("n_bytes") > 0,
          col("n_deflate").cast("double") / col("n_bytes"))
          .otherwise(lit(null).cast("double")))
  }

  /** Checkpoints for the Heaps'-law vocabulary-growth fit (bounded by
    * construction). */
  val HeapsK = 20

  /** HEAPS'-LAW / VOCABULARY-GROWTH REPORT (Heaps 1978 — natural text
    * grows vocabulary as V(n) ≈ K·n^β with β ≈ 0.4–0.6; a saturating
    * curve flags a templated/closed-vocabulary corpus, super-linear
    * growth flags encoding damage — the companion card to q_doc_zipf):
    * the OLS log-log slope of vocabulary size V(p) against corpus
    * position p at [[HeapsK]] checkpoints p_j = ⌊j·N/K⌋. Exactness: the
    * GLOBAL position of every token occurrence is an exact integer (the
    * q_doc_pack two-phase prefix sum over doc_id order), a word's first
    * occurrence fp = min pos is exact, the checkpoint a word first
    * lands in is the integer ceil-division j₀ = ⌈K·fp/N⌉ (floor(j·N/K)
    * ≥ fp ⟺ j·N ≥ K·fp for integers — no float ever buckets), V(p_j)
    * cumulates j₀-counts over the K-row frame, and the OLS fold rides
    * the q_doc_zipf quantized-log grid with the (1e6·num) DIV den rule.
    *
    * Scale shape: one corpus scan for offsets + the (tok, pos) explode,
    * a vocabulary-bounded min-aggregate, a ≤K-row bucket count; all
    * window math on K-row or bucket-count frames (the pack-bucket
    * discipline keeps the offset window KB-scale). */
  def qDocHeaps(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lq(c: Column): Column =
      floor(lit(1e6) * log(c.cast("double"))).cast("long")
    val K = HeapsK
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", expr(s"doc_id DIV $PackBucket"))
    val bw = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = docs.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("bsum"))
      .withColumn("boffset", coalesce(sum(col("bsum")).over(bw), lit(0L)))
      .select(col("bucket"), col("boffset"))
    val ww = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val firsts = docs.join(broadcast(bucketOffsets), "bucket")
      .withColumn("off",
        col("boffset") + coalesce(sum(col("n_tok")).over(ww), lit(0L)))
      .select(col("off"), posexplode(col("toks")).as(Seq("i", "tok")))
      .select(col("tok"), (col("off") + col("i") + 1).as("pos"))
      .groupBy(col("tok")).agg(min(col("pos")).as("fp"))
    val nv = docs.agg(sum(col("n_tok")).cast("long").as("n"))
    val vocab = firsts.agg(count(lit(1)).as("vocab_size"))
    val j0 = firsts.crossJoin(broadcast(nv))
      .select(expr(s"($K * fp + n - 1) DIV n").as("j0"))
      .groupBy(col("j0")).agg(count(lit(1)).as("c"))
    val ck = s.range(1, K + 1).select(col("id").as("j"))
    val fit = ck
      .join(j0, col("j0") <= col("j")) // K×K at most: model-sized
      .groupBy(col("j")).agg(sum(col("c")).cast("long").as("v"))
      .crossJoin(broadcast(nv))
      .select(expr(s"(j * n) DIV $K").as("p"), col("v"))
      .filter(col("p") >= 1 && col("v") >= 1) // degenerate tiny corpora
      .select(lq(col("p")).as("x"), lq(col("v")).as("y"))
      .agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * (k * sxy - sx * sy)" +
          " DIV (CAST(k AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0))" +
          " * sx) AS BIGINT)").as("slope_scaled"))
    fit.crossJoin(broadcast(nv)).crossJoin(broadcast(vocab))
      .select(col("n").as("n_tokens"), col("vocab_size"), col("k"),
        col("slope_scaled"),
        (col("slope_scaled").cast("double") / 1000000.0).as("beta"))
  }

  def qDocHeapsSql: String = {
    val k = HeapsK
    s"""WITH t AS (SELECT doc_id,
       |    regexp_split_to_array(trim(text), ' +') AS toks FROM documents),
       |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok, toks
       |  FROM t WHERE len(toks) > 0),
       |o AS (SELECT doc_id, n_tok, toks,
       |  CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS off
       |  FROM d),
       |fp AS (SELECT toks[i] AS tok, CAST(min(off + i) AS BIGINT) AS fp
       |  FROM o, unnest(range(1, CAST(len(toks) AS BIGINT) + 1)) AS r(i)
       |  GROUP BY 1),
       |nn AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n FROM d),
       |vv AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM fp),
       |j0 AS (SELECT ($k * fp + n - 1) // n AS j0,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM fp CROSS JOIN nn GROUP BY 1),
       |vj AS (SELECT ck.j, CAST(sum(j0.c) AS BIGINT) AS v
       |  FROM unnest(range(1, $k + 1)) AS ck(j) JOIN j0 ON j0.j0 <= ck.j
       |  GROUP BY ck.j),
       |xy AS (SELECT
       |    CAST(floor(1e6 * ln(CAST((j * n) // $k AS DOUBLE))) AS BIGINT)
       |      AS x,
       |    CAST(floor(1e6 * ln(CAST(v AS DOUBLE))) AS BIGINT) AS y
       |  FROM vj CROSS JOIN nn
       |  WHERE (j * n) // $k >= 1 AND v >= 1),
       |fit AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM xy
       |)
       |SELECT n AS n_tokens, vocab_size, k,
       |  CAST(CAST(1000000 AS HUGEINT) * (k * sxy - sx * sy)
       |    // (CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
       |    AS BIGINT) AS slope_scaled,
       |  CAST(CAST(CAST(1000000 AS HUGEINT) * (k * sxy - sx * sy)
       |    // (CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
       |    AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS beta
       |FROM fit CROSS JOIN nn CROSS JOIN vv""".stripMargin
  }

  /** Candidate-phrase length cap for [[qDocRake]] (the practical RAKE
    * variant: unbounded runs on low-stopword text degenerate into
    * whole-document "phrases" and unbounded strings at scale). */
  val RakeMaxLen = 8

  /** RAKE KEYPHRASE EXTRACTION (Rose, Engel, Cramer & Cowley 2010,
    * "Automatic Keyword Extraction from Individual Documents" — the
    * standard unsupervised keyphrase baseline): candidate phrases are
    * maximal stopword-free token runs (capped at [[RakeMaxLen]] words);
    * each word scores deg(w)/freq(w) over the candidate set (deg = Σ of
    * the lengths of phrases containing w, freq = occurrences); a phrase
    * scores the sum of its words' scores; report the corpus top-20.
    *
    * Exactness: deg and freq are INTEGERS, so the word score quantizes
    * as (1e6·deg) DIV freq — an exact integer floor of an exact
    * rational, NO float anywhere (stronger than the ln-grid ops: not
    * even a correctly-rounded libm call to agree on). Phrase scores are
    * exact BIGINT sums; ties break on the phrase string (ASCII binary
    * collation in both engines). The 1e6·deg product rides
    * DECIMAL(38,0)/HUGEINT (deg is corpus-token-scaled — the
    * q_evt_lttb width rule).
    *
    * Scale shape: one posexplode stream; the phrase-id running count is
    * a PER-DOC window (bounded frames — a document's own length); the
    * phrase build and word stats are map-side-combined aggs (word
    * relation is vocabulary-bounded, joins hint-free); the final cut is
    * a bounded TakeOrdered. */
  def qDocRake(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("is_stop", col("w").isin(stopwords: _*))
      .withColumn("pid", sum(col("is_stop").cast("int")).over(wDoc))
      .filter(!col("is_stop"))
    val phrases = toks
      .groupBy(col("doc_id"), col("pid"))
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("ws"))
      .select(col("doc_id"), col("pid"),
        transform(col("ws"), x => x.getField("w")).as("words"))
      .withColumn("len", size(col("words")))
      .filter(col("len") <= RakeMaxLen)
      .localCheckpoint() // feeds the word stats AND the scoring pass
    val wordStats = phrases
      .select(col("len"), explode(col("words")).as("w"))
      .groupBy(col("w"))
      .agg(sum(col("len")).cast("long").as("deg"),
        count(lit(1)).as("freq"))
      .withColumn("wscore", expr(
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * deg DIV freq AS BIGINT)"))
    phrases
      .select(col("doc_id"), col("pid"), col("len"),
        concat_ws(" ", col("words")).as("phrase"),
        explode(col("words")).as("w"))
      .join(wordStats.select(col("w"), col("wscore")), "w")
      .groupBy(col("doc_id"), col("pid"), col("phrase"), col("len"))
      .agg(sum(col("wscore")).cast("long").as("score"))
      .groupBy(col("phrase"))
      .agg(max(col("len")).cast("int").as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("score")).as("score_scaled")) // identical across instances
      .orderBy(col("score_scaled").desc, col("phrase"))
      .limit(20)
  }

  def qDocRakeSql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, i AS pos, t[i] AS w,
       |    t[i] IN ($stopList) AS is_stop
       |  FROM (SELECT doc_id,
       |          regexp_split_to_array(trim(text), ' +') AS t
       |        FROM documents) x,
       |    unnest(generate_series(1, len(t))) AS g(i)
       |), marked AS (
       |  SELECT doc_id, pos, w,
       |    sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS pid
       |  FROM toks
       |  QUALIFY NOT is_stop
       |), phrases AS MATERIALIZED (
       |  SELECT doc_id, pid,
       |    string_agg(w, ' ' ORDER BY pos) AS phrase,
       |    CAST(count(*) AS BIGINT) AS len,
       |    list(w ORDER BY pos) AS words
       |  FROM marked GROUP BY doc_id, pid
       |  HAVING count(*) <= $RakeMaxLen
       |), ws AS MATERIALIZED (
       |  SELECT u.w,
       |    CAST(sum(len) AS BIGINT) AS deg,
       |    CAST(count(*) AS BIGINT) AS freq
       |  FROM phrases, unnest(words) AS u(w)
       |  GROUP BY u.w
       |), scored AS (
       |  SELECT p.doc_id, p.pid, p.phrase, p.len,
       |    CAST(sum(CAST(CAST(1000000 AS HUGEINT) * ws.deg // ws.freq
       |      AS BIGINT)) AS BIGINT) AS score
       |  FROM phrases p, unnest(p.words) AS u(w)
       |  JOIN ws ON ws.w = u.w
       |  GROUP BY p.doc_id, p.pid, p.phrase, p.len
       |)
       |SELECT phrase, CAST(max(len) AS INT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(max(score) AS BIGINT) AS score_scaled
       |FROM scored GROUP BY phrase
       |ORDER BY score_scaled DESC, phrase LIMIT 20""".stripMargin
  }

  /** CCNET-STYLE PERPLEXITY FILTER (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data" —
    * the KenLM-perplexity head/middle/tail split that every published
    * web-corpus pipeline since has shipped): a word-BIGRAM language
    * model with add-1 smoothing is TRAINED IN THE ENGINE on the
    * reference half of the corpus (even doc_ids — the langid_model
    * split), every document is scored by its total negative
    * log-likelihood under that model, and documents bucket
    * head/middle/tail against the pooled reference rate (head = at or
    * below the reference mean NLL/token; tail = above 1.5× it — CCNet's
    * "keep the head, drop the tail" shape with engine-exact thresholds).
    *
    * Exactness discipline (the DSIR/entropy grid): each bigram (a,b)
    * contributes L(ctx(a)+V) − L(cnt(a,b)+1) with L(x) = floor(1e6·ln x)
    * over INTEGER train-half counts (ctx = count of a as a bigram left
    * context, V = context-vocabulary size; an unseen bigram's numerator
    * is ln 1 = 0, exact in both engines), so per-doc NLL is an exact
    * BIGINT sum. The bucket decision cross-multiplies exact integers
    * (nll·B vs S·n_bg) in DECIMAL(38,0) — HUGEINT on the oracle side,
    * the q_evt_lttb width rule — so no float division ever decides a
    * bucket. The only doubles are the per-group report rates, each one
    * division of exactly-represented integers.
    *
    * Scale shape (100 TB): ONE corpus pass — the per-(doc, bigram) count
    * frame materializes once (the DSIR fold) and feeds the model counts,
    * the reference totals, and the scoring join; the model relations are
    * vocabulary-bounded (a real web corpus hash-buckets them to stay
    * bounded — the DsirDelta argument) and join hint-free (AQE
    * broadcasts small models); every corpus-sized shuffle carries
    * (doc_id, longs), never text. The report is sources×3 rows. */
  def qDocPerplexity(s: SparkSession, d: String): DataFrame =
    perplexityBuckets(Tables.documents(s, d))

  /** Core of [[qDocPerplexity]] over any (doc_id, source, text) frame —
    * split out so the spec can plant a corpus with a known-gibberish
    * tail and assert the bucket assignment end-to-end. */
  private[graft] def perplexityBuckets(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def lq(c: Column): Column =
      floor(lit(1e6) * log(c.cast("double"))).cast("long")
    // one corpus pass: per-(doc, bigram) counts materialize once and feed
    // the model, the normalizer totals, and the scoring join
    val bg = docs
      .select(col("doc_id"), col("source"),
        (col("doc_id") % 2 === 0).as("train"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2) // also guards sequence(1,0) counting DOWN
      .select(col("doc_id"), col("source"), col("train"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("a"),
            element_at(col("t"), i + 1).as("b")))).as("p"))
      .select(col("doc_id"), col("source"), col("train"),
        col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("doc_id"), col("source"), col("train"),
        col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val bigr = bg.filter(col("train"))
      .groupBy(col("a"), col("b")).agg(sum(col("c")).as("cb"))
    val ctx = bg.filter(col("train"))
      .groupBy(col("a")).agg(sum(col("c")).as("ca"))
      .localCheckpoint() // vocabulary-bounded; feeds V and the join
    val vCount = ctx.count() // context-vocabulary size for add-1 smoothing
    val scored = bg
      .join(bigr, Seq("a", "b"), "left")
      .join(ctx, Seq("a"), "left")
      .groupBy(col("doc_id"), col("source"), col("train"))
      .agg(sum(col("c")).cast("long").as("n_bg"),
        sum(col("c") * (lq(coalesce(col("ca"), lit(0L)) + lit(vCount)) -
          lq(coalesce(col("cb"), lit(0L)) + 1))).cast("long").as("nll"))
      .localCheckpoint() // per-doc longs; feeds the totals AND the buckets
    val tot = scored.filter(col("train"))
      .agg(sum(col("nll")).cast("long"), sum(col("n_bg")).cast("long"))
      .head()
    val (sRef, bRef) = (tot.getLong(0), tot.getLong(1))
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val lhs = dec(col("nll")) * dec(lit(bRef))
    val rhs = dec(lit(sRef)) * dec(col("n_bg"))
    val bucket = when(lhs <= rhs, "head")
      .when(lhs * dec(lit(2)) > rhs * dec(lit(3)), "tail")
      .otherwise("middle")
    scored.withColumn("bucket", bucket)
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bg")).cast("long").as("n_bigrams"),
        sum(col("nll")).cast("long").as("nll_scaled"))
      .withColumn("nll_per_token",
        col("nll_scaled").cast("double") /
          (col("n_bigrams") * lit(1000000L)).cast("double"))
  }

  def qDocPerplexitySql: String =
    """WITH base AS (
      |  SELECT doc_id, source, doc_id % 2 = 0 AS train, t
      |  FROM (SELECT doc_id, source,
      |          regexp_split_to_array(trim(text), ' +') AS t
      |        FROM documents) x
      |  WHERE len(t) >= 2
      |), bg AS MATERIALIZED (
      |  SELECT doc_id, source, train, t[i] AS a, t[i + 1] AS b,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, source, train, t,
      |          unnest(generate_series(1, len(t) - 1)) AS i FROM base) y
      |  GROUP BY doc_id, source, train, a, b
      |), bigr AS MATERIALIZED (
      |  SELECT a, b, CAST(sum(c) AS BIGINT) AS cb
      |  FROM bg WHERE train GROUP BY a, b
      |), ctx AS MATERIALIZED (
      |  SELECT a, CAST(sum(c) AS BIGINT) AS ca
      |  FROM bg WHERE train GROUP BY a
      |), vt AS (
      |  SELECT CAST(count(*) AS BIGINT) AS v FROM ctx
      |), scored AS MATERIALIZED (
      |  SELECT doc_id, source, train, CAST(sum(c) AS BIGINT) AS n_bg,
      |    CAST(sum(c * (
      |      CAST(floor(1e6 * ln(CAST(COALESCE(ca, 0) + v AS DOUBLE)))
      |        AS BIGINT)
      |      - CAST(floor(1e6 * ln(CAST(COALESCE(cb, 0) + 1 AS DOUBLE)))
      |        AS BIGINT))) AS BIGINT) AS nll
      |  FROM bg LEFT JOIN bigr USING (a, b) LEFT JOIN ctx USING (a)
      |  CROSS JOIN vt
      |  GROUP BY doc_id, source, train
      |), tot AS (
      |  SELECT CAST(sum(nll) AS BIGINT) AS s_ref,
      |    CAST(sum(n_bg) AS BIGINT) AS b_ref
      |  FROM scored WHERE train
      |), lab AS (
      |  SELECT source,
      |    CASE WHEN CAST(nll AS HUGEINT) * CAST(b_ref AS HUGEINT)
      |           <= CAST(s_ref AS HUGEINT) * CAST(n_bg AS HUGEINT)
      |         THEN 'head'
      |         WHEN CAST(nll AS HUGEINT) * CAST(b_ref AS HUGEINT) * 2
      |           > CAST(s_ref AS HUGEINT) * CAST(n_bg AS HUGEINT) * 3
      |         THEN 'tail'
      |         ELSE 'middle' END AS bucket,
      |    n_bg, nll
      |  FROM scored CROSS JOIN tot
      |)
      |SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_bg) AS BIGINT) AS n_bigrams,
      |  CAST(sum(nll) AS BIGINT) AS nll_scaled,
      |  CAST(sum(nll) AS DOUBLE) / CAST(sum(n_bg) * 1000000 AS DOUBLE)
      |    AS nll_per_token
      |FROM lab GROUP BY source, bucket""".stripMargin

  /** FILTER-CASCADE ATTRITION REPORT — the per-source funnel table every
    * published curation pipeline ships (CCNet/FineWeb report exactly
    * this: how many documents each successive gate kills): input →
    * language-consistency gate (the marker-word langid heuristic must
    * agree with the labeled lang) → quality floor (≥12 tokens, distinct
    * ratio ≥ 1/2 — the curriculum tiers' floor) → exact dedup (keep =
    * min doc_id per md5 among SURVIVORS — dedup ranks after the cheap
    * gates, so a duplicate of a killed doc can still be kept; the
    * real-pipeline stage order). Counts are sequential survivals, all
    * exact integers.
    *
    * Scale shape: ONE scan; the only corpus-sized shuffle is the
    * md5-partition window for the survivor-min (the rep-collapse rule —
    * a window min, never groupBy+self-join), moving 32-char hashes +
    * flags, never text; the funnel aggregate map-side-combines to
    * #sources rows. */
  def qDocCascade(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text")))
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("pred",
        when(col("text").contains("data"), "en")
          .when(col("text").contains("table"), "de")
          .when(col("text").contains("query"), "fr")
          .when(col("text").contains("row"), "es")
          .otherwise("zh"))
      .withColumn("lang_ok", col("pred") === col("lang"))
      .withColumn("surv", col("lang_ok") && col("n_tokens") >= 12 &&
        col("n_distinct") * 2 >= col("n_tokens"))
      .withColumn("min_surv",
        min(when(col("surv"), col("doc_id"))).over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_input"),
        count(when(col("lang_ok"), 1)).as("n_lang"),
        count(when(col("surv"), 1)).as("n_quality"),
        count(when(col("surv") && col("doc_id") === col("min_surv"), 1))
          .as("n_unique"),
        sum(when(col("surv") && col("doc_id") === col("min_surv"),
          col("n_chars")).otherwise(0L)).as("kept_chars"))
  }

  def qDocCascadeSql: String =
    """WITH b AS (
      |  SELECT doc_id, source, n_chars, lang, md5(text) AS h,
      |    CAST(len(regexp_split_to_array(trim(text), ' +')) AS INT)
      |      AS n_tokens,
      |    CAST(len(list_distinct(regexp_split_to_array(trim(text), ' +')))
      |      AS INT) AS n_distinct,
      |    CASE WHEN text LIKE '%data%' THEN 'en'
      |         WHEN text LIKE '%table%' THEN 'de'
      |         WHEN text LIKE '%query%' THEN 'fr'
      |         WHEN text LIKE '%row%' THEN 'es'
      |         ELSE 'zh' END AS pred
      |  FROM documents
      |), f AS (
      |  SELECT *, (pred = lang) AS lang_ok,
      |    (pred = lang AND n_tokens >= 12
      |      AND 2 * n_distinct >= n_tokens) AS surv
      |  FROM b
      |), g AS (
      |  SELECT *, min(CASE WHEN surv THEN doc_id END)
      |    OVER (PARTITION BY h) AS min_surv
      |  FROM f
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_input,
      |  CAST(count(CASE WHEN lang_ok THEN 1 END) AS BIGINT) AS n_lang,
      |  CAST(count(CASE WHEN surv THEN 1 END) AS BIGINT) AS n_quality,
      |  CAST(count(CASE WHEN surv AND doc_id = min_surv THEN 1 END)
      |    AS BIGINT) AS n_unique,
      |  CAST(sum(CASE WHEN surv AND doc_id = min_surv THEN n_chars
      |    ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM g GROUP BY source""".stripMargin

  def qDocTypicalitySql: String =
    """WITH tg AS (
      |  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS g FROM (
      |    SELECT doc_id, text,
      |      unnest(generate_series(1, length(text) - 2)) AS i
      |    FROM documents WHERE length(text) >= 3)
      |), c AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS cnt FROM tg GROUP BY g
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
      |  CAST(sum(cnt) AS BIGINT) AS popularity,
      |  CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE) / count(*) AS typicality
      |FROM tg JOIN c USING (g)
      |GROUP BY doc_id""".stripMargin
}
