package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.C — model-based quality filtering: a fastText-class LINEAR text
  * classifier (hashed bag-of-ngrams features + logistic regression)
  * TRAINED INSIDE THE ENGINE by deterministic full-batch gradient
  * descent — the "quality classifier" stage of modern pretraining
  * pipelines (CCNet/GPT-3/FineWeb all gate raw corpora on exactly this
  * model shape: cheap linear scoring over hashed n-grams, trained on a
  * known-good positive set vs the raw pool).
  *
  * Training shape (the 100 TB lens): the model is a B-sized dense
  * weight vector — KB-scale, so it BROADCASTS as a literal array into
  * every iteration's scoring expression (no join); one iteration is ONE
  * map+aggregate job over the cached sparse feature frame (margins via
  * an `aggregate` fold over each doc's (bucket, x) pairs, then the
  * gradient re-aggregates exploded pairs to B partial-summed buckets —
  * map-side combine keeps the shuffle at B rows per partition).
  * Features materialize ONCE (localCheckpoint) before the loop; the
  * loop itself moves only the B-row gradient to the driver per
  * iteration — the classic "broadcast model / aggregate gradient"
  * distributed-training loop, which is how a linear model trains at any
  * corpus size. AQE stays ON (each iteration is a single fixed-shape
  * job — no per-iteration replanning storm; the CC-loop rule targets
  * DataFrame-growing loops, not fixed-frame scans).
  *
  * Float caveat (why this op is [rows]+spec, not oracle-hash): gradient
  * sums are double accumulations whose partition order Spark does not
  * pin, so weights are reproducible only to ulp-drift; every SPEC
  * assertion is therefore a margin property (holdout accuracy, weight
  * sign structure), never a bit-exact weight. */
object Classifier {

  /** Hashed feature buckets (the fastText `-hash` dimension). */
  val Buckets = 1024
  /** Full-batch ADAGRAD iterations / learning rate / L2. Plain GD is
    * hopeless here — text features are wildly ill-conditioned (a few
    * stopword buckets dominate the curvature; measured: 1000 GD
    * iterations still sat at the majority class while a ridge probe hit
    * 99%) — but Adagrad's per-bucket step scaling is FREE in this
    * architecture: the full gradient lands on the driver every
    * iteration anyway, so the accumulators are a B-sized driver array.
    * Binary presence features (not count-normalized — measured 2× fewer
    * iterations to the same accuracy); 50 one-job iterations land within
    * ~5 points of the corpus's LINEAR-SEPARABILITY CEILING (a ridge
    * probe tops out at 66% at sf0.1 — the synthetic langs share most
    * vocabulary; 61% measured train accuracy; at sf0.01's 500 docs the
    * same probe "reaches" 99% purely by small-n memorization).
    * ClassifierSpec proves 100% holdout accuracy where the classes are
    * genuinely separable. */
  val Iters = 50
  val Lr = 2.0
  val L2 = 1e-5

  /** The trained model: dense weights over the hash buckets + bias. */
  final case class Model(w: Array[Double], bias: Double) {
    /** Margin (pre-sigmoid score) column for a feature-array column. */
    private[graft] def marginCol(fx: Column): Column = {
      val wLit = typedLit(w.toSeq)
      lit(bias) + aggregate(fx, lit(0.0),
        (acc, e) => acc +
          element_at(wLit, e.getField("b") + 1) * e.getField("x"))
    }
  }

  /** Sparse hashed unigram+bigram features, binary presence per doc:
    * (doc_id, label, fx: array<struct<b int, x double>>, n_feat).
    * Bigrams come from the MATERIALIZED token array (never a lambda
    * split), buckets from xxhash64 — one narrow pass from the scan. */
  private[graft] def featurize(docs: DataFrame,
      labelCol: Column): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), labelCol.cast("double").as("y"),
        TextOps.tokens(col("text")).as("t"))
      .withColumn("feats", concat(col("t"),
        when(size(col("t")) >= 2,
          transform(sequence(lit(1), size(col("t")) - 1),
            i => concat(element_at(col("t"), i), lit(" "),
              element_at(col("t"), i + 1))))
          .otherwise(array())))
      .select(col("doc_id"), col("y"),
        explode(col("feats")).as("f"))
      .select(col("doc_id"), col("y"),
        pmod(xxhash64(col("f")), lit(Buckets)).cast("int").as("b"))
    pairs
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("c")).as("n_feat"),
        collect_list(struct(col("b"), col("c"))).as("bc"))
      .select(col("doc_id"), col("y"), col("n_feat"),
        // binary presence (x = 1 per active bucket) — the standard text-LR
        // encoding, and much better conditioned than count normalization
        transform(col("bc"), e => struct(e.getField("b").as("b"),
          lit(1.0).as("x"))).as("fx"))
  }

  /** Train logistic regression by full-batch GD over a featurized frame
    * (must be materialized — the loop scans it [[Iters]] times).
    *
    * `sampleFrac` < 1 turns each iteration's gradient into a SEEDED
    * DETERMINISTIC SAMPLE (r14 — the 100× scale path: full-batch fit
    * cost is iterations × corpus by design, so at corpus scale sample
    * the featurized frame instead): iteration i keeps the docs with
    * pmod(xxhash64(doc_id, i, seed), 10^6) < frac·10^6 — a pure
    * function of (doc identity, iteration, seed) like every other prep
    * decision, so reruns are reproducible and each iteration sees a
    * DIFFERENT deterministic slice (the minibatch-SGD effect). The
    * gradient normalizes by the iteration's ACTUAL sampled count
    * (read from the bias sentinel's ride-along count — still one job).
    * Flag-off (frac = 1) the filter is skipped and the normalizer
    * equals nDocs — the exact full-batch arithmetic. Ceiling-check
    * epsilon (documented for callers): a sampled fit sees ~frac·n docs
    * per step, so expect accuracy within a few points of the full-batch
    * fit at the same iteration count — ClassifierSpec pins 100% holdout
    * on the separable fixture at frac = 0.5 and a widened ceiling band
    * on the overlap fixture. */
  private[graft] def fit(feats: DataFrame, nDocs: Long,
      sampleFrac: Double = 1.0, seed: Long = 42L): Model = {
    var w = new Array[Double](Buckets)
    var bias = 0.0
    val gAcc = new Array[Double](Buckets) // Adagrad accumulators
    var gAccB = 0.0
    (1 to Iters).foreach { it =>
      val m = Model(w, bias)
      val base =
        if (sampleFrac >= 1.0) feats
        else feats.filter(
          pmod(xxhash64(col("doc_id"), lit(it), lit(seed)), lit(1000000L))
            < lit((sampleFrac * 1e6).toLong))
      // ONE job per iteration: margins fold per doc, then the exploded
      // (bucket, x·err) pairs re-aggregate to ≤ B+1 rows (map-side
      // combined); the bias gradient rides along as sentinel bucket -1,
      // whose count is the iteration's sampled-doc count (one per doc)
      val rows = base
        .withColumn("err", lit(1.0) /
          (lit(1.0) + exp(-m.marginCol(col("fx")))) - col("y"))
        .select(col("err"), explode(concat(col("fx"),
          array(struct(lit(-1).cast("int").as("b"), lit(1.0).as("x")))))
          .as("e"))
        .groupBy(col("e.b").as("b"))
        .agg(sum(col("err") * col("e.x")).as("g"),
          count(lit(1)).as("cnt"))
        .collect()
      val nIt =
        if (sampleFrac >= 1.0) nDocs
        else rows.collectFirst {
          case r if r.getInt(0) == -1 => r.getLong(2) }.getOrElse(0L)
      if (nIt > 0) {
        val w2 = w.clone()
        rows.foreach { r =>
          val b = r.getInt(0)
          if (b < 0) {
            val g = r.getDouble(1) / nIt
            gAccB += g * g
            bias -= Lr * g / (math.sqrt(gAccB) + 1e-8)
          } else {
            val g = r.getDouble(1) / nIt + L2 * w(b)
            gAcc(b) += g * g
            w2(b) -= Lr * g / (math.sqrt(gAcc(b)) + 1e-8)
          }
        }
        w = w2
      }
    }
    Model(w, bias)
  }

  /** TRAIN + SCORE in one operator: fit the classifier to predict the
    * `lang = 'en'` slice (the known-good-set stand-in) from hashed
    * unigram+bigram features, then score EVERY doc — per-doc quality
    * decisions, the corpus-gating output shape. [rows]-checked (float
    * model outputs; see the header caveat) with ClassifierSpec carrying
    * the correctness burden: 100% HOLDOUT accuracy on a planted
    * separable corpus (disjoint vocabularies, half the docs never seen
    * in training) and a near-ceiling check against an in-test ridge
    * probe on an overlapping fixture. */
  def qDocClassifier(s: SparkSession, d: String): DataFrame = {
    val feats = graft.BenchPhase("featurize") {
      featurize(Tables.documents(s, d), col("lang") === "en")
        .localCheckpoint()
    }
    val n = feats.count()
    val model = graft.BenchPhase("fit")(fit(feats, n))
    feats.select(col("doc_id"), col("y").cast("boolean").as("label_en"),
      col("n_feat"), model.marginCol(col("fx")).as("margin"))
      .select(col("doc_id"), col("label_en"), col("n_feat"),
        col("margin"), (col("margin") > 0).as("predicted_en"))
  }
}
