package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** BPE TOKENIZER TRAINING, distributed — the capability a training-data
  * engine owes the model side of the pipeline (every corpus ships with
  * the tokenizer trained ON it; cf. Sennrich et al. 2016, the
  * GPT-2/SentencePiece lineage).
  *
  * Scale shape: the classic algorithm trains on the WORD-FREQUENCY table,
  * not the corpus — ONE corpus scan (map-side-combined word count)
  * reduces 100 TB to a vocabulary-sized relation (Heaps-law sublinear),
  * and every merge iteration is a pair-count aggregate + a rewrite over
  * THAT table. The iterations follow the repo's loop discipline
  * (SetSim/CC): one localCheckpoint per round to keep plans flat, one
  * driver-visible row per round (the winning pair — argmax via
  * TakeOrdered, never a table collect). The learned artifact is N merge
  * rules — KB-scale, broadcastable anywhere.
  *
  * Determinism: ties on pair count break lexicographically, so the same
  * corpus always learns the same rules on any cluster layout (the spec
  * proves rule-sequence equality against a driver-side reference).
  */
object Bpe {

  /** End-of-word sentinel (classic BPE): lets the model distinguish
    * "er" inside a word from "er" ending one; merges never cross it. */
  val Eow = "</w>"

  /** A word as its current symbol sequence. */
  private def initSymbols(word: String): Array[String] =
    word.map(_.toString).toArray :+ Eow

  /** Apply one merge rule everywhere in one word (left-to-right). */
  def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Word-table size up to which the merge loop runs ON THE DRIVER
    * (r17): the corpus pass already reduces 100 TB to a Heaps-law
    * vocabulary relation, and at ≤ this many distinct words the table is
    * the same bounded-driver-state class as the repo's routing maps and
    * classifier gradients (~≤200 MB) — while the distributed loop pays
    * 2 fixed-cost Spark jobs per merge round (measured ~8 s for 16
    * rounds over a 30k-word table, >95% fixed job overhead). Above the
    * bound the distributed loop runs unchanged. Both paths replay the
    * identical (count desc, pair lexicographic) tie-break, so the rule
    * sequence is byte-equal either way (BpeSpec pins both against the
    * reference). */
  val DriverFitWords = 4000000L

  /** Train `nMerges` BPE rules over a corpus of texts. Returns the rules
    * in learned order. One corpus pass; then vocabulary-sized rounds.
    * Loop discipline (the Graph/Dedup pattern): a CHILD session carries
    * AQE-off + a vocabulary-scaled shuffle width so the ~2·nMerges round
    * jobs stay flat and the confs never leak to concurrent queries. */
  def train(docs0: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] =
    train(docs0, textCol, nMerges, DriverFitWords)

  private[graft] def train(docs0: DataFrame, textCol: String,
      nMerges: Int, driverFitWords: Long): Seq[(String, String)] = {
    val caller = docs0.sparkSession
    val spark = caller.newSession()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import org.apache.spark.sql.GraftShim
    val docs = GraftShim.ofRows(spark, GraftShim.logicalPlan(docs0))
    import spark.implicits._
    // corpus pass: word frequencies (map-side combined; output
    // vocabulary-sized)
    var words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)]
      .map { case (w, n) => (initSymbols(w), n) }
      .localCheckpoint()
    val vocab = words.count()
    if (vocab <= driverFitWords) return trainLocal(
      words.collect().map { case (syms, n) => (syms, n) }, nMerges)
    spark.conf.set("spark.sql.shuffle.partitions", math.max(1L,
      math.min(caller.conf.get("spark.sql.shuffle.partitions").toLong,
        vocab / 200000L + 1L)).toString)
    val rules = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    while (round < nMerges) {
      // pair counts over the word table; winner = (count desc, pair asc)
      val top = words.flatMap { case (syms, n) =>
        (0 until syms.length - 1).map(i => ((syms(i), syms(i + 1)), n))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, n) => (p._1, p._2, n) }
        .toDF("a", "b", "n")
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) round = nMerges
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        rules += ((a, b))
        words = words.map { case (syms, n) => (applyMerge(syms, a, b), n) }
          .localCheckpoint()
        round += 1
      }
    }
    rules.toSeq
  }

  /** The merge loop over a collected word-frequency table — the
    * [[DriverFitWords]] fast path. Same winner rule as the distributed
    * rounds: max count, ties to the lexicographically smallest (a, b). */
  private def trainLocal(words0: Array[(Array[String], Long)],
      nMerges: Int): Seq[(String, String)] = {
    var words = words0
    val rules = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    while (round < nMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) round = nMerges
      else {
        val (a, b) = counts.foldLeft(("", "", Long.MinValue)) {
          case (best @ (ba, bb, bn), ((ka, kb), kn)) =>
            if (kn > bn || (kn == bn
                && (ka < ba || (ka == ba && kb < bb)))) (ka, kb, kn)
            else best
        } match { case (wa, wb, _) => (wa, wb) }
        rules += ((a, b))
        words = words.map { case (syms, n) => (applyMerge(syms, a, b), n) }
        round += 1
      }
    }
    rules.toSeq
  }

  /** Encode texts with learned rules: rules applied IN RANK ORDER per
    * word — exactly the training rewrite, so a training word's encoding
    * equals its final training state. Partition-local; the rule table
    * rides the closure (KB-scale). Returns (doc_id, n_tokens, tokens). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val local = rules.toArray
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.trim.split(" +").filter(_.nonEmpty).flatMap { w =>
          var syms = initSymbols(w)
          var i = 0
          while (i < local.length) {
            syms = applyMerge(syms, local(i)._1, local(i)._2); i += 1
          }
          syms
        }
        (id, toks.length.toLong, toks)
      }
      .toDF(idCol, "n_tokens", "tokens")
  }

  /** TOKENIZER-FERTILITY REPORT (NEW r14) — the diagnostic every
    * tokenizer paper tabulates and every pipeline re-checks per data
    * source: pieces-per-word (fertility) and the whole-word rate under
    * the trained merge table. A source whose fertility spikes is one
    * the tokenizer under-serves (different language, encoding damage,
    * jargon) — the data-mix signal this report exists for. Per source:
    * docs, words, BPE pieces, words emerging as a SINGLE piece,
    * fertility = pieces/words and whole_frac = whole/words (exact
    * integer ratios cast double). Deterministic given the corpus (the
    * BPE trainer's count-desc/pair-lex tie break), [rows]-checked;
    * BpeSpec proves the counts against a driver-side re-encode and the
    * frequent-word/rare-word fertility split on a planted corpus.
    *
    * Scale: training is the bounded-vocab loop [[train]] documents;
    * the measurement pass is ONE narrow typed map (per doc: words,
    * pieces, whole-words — no shuffle) + a #sources-row aggregate. */
  def qTokFertility(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val rules = train(docs, "text", 24)
    val local = rules.toArray
    docs.select(col("source"), col("text"))
      .as[(String, String)]
      .map { case (src, text) =>
        val words = text.trim.split(" +").filter(_.nonEmpty)
        var pieces = 0L; var whole = 0L
        words.foreach { w =>
          var syms = initSymbols(w)
          var i = 0
          while (i < local.length) {
            syms = applyMerge(syms, local(i)._1, local(i)._2); i += 1
          }
          pieces += syms.length
          if (syms.length == 1) whole += 1
        }
        (src, 1L, words.length.toLong, pieces, whole)
      }
      .toDF("source", "n_docs", "n_words", "n_pieces", "n_whole")
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_whole")).as("n_whole"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_pieces"), col("n_whole"),
        (col("n_pieces").cast("double") / col("n_words")).as("fertility"),
        (col("n_whole").cast("double") / col("n_words")).as("whole_frac"))
  }

  /** Train-and-report: the learned merge table as a relation —
    * deterministic given the corpus (count-desc, pair-lexicographic tie
    * break), so the driver's rows-check is stable run to run. [rows]:
    * the rule SEQUENCE is the artifact; BpeSpec proves it equals a
    * driver-side reference implementation and that encoding reproduces
    * training states. */
  def qDocBpe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rules = train(Tables.documents(s, d), "text", 24)
    rules.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rank", "left", "right")
  }
}
