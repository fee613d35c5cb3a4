package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends GraftSpec {

  test("hashed logistic classifier: 100% holdout accuracy on a planted " +
      "separable corpus — the model generalizes, it does not memorize " +
      "doc ids") {
    val sp = spark; import sp.implicits._
    // disjoint vocabularies → genuinely linearly separable; deterministic
    // 8-token texts so every run trains on identical data
    val tgtVocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val rawVocab = Seq("zeta", "eta", "theta", "iota", "kappa")
    def text(vocab: Seq[String], seed: Int): String =
      (0 until 8).map(i => vocab((seed * 7 + i * 3) % vocab.size))
        .mkString(" ")
    val docs = (0 until 80).map { i =>
      val tgt = i % 2 == 0
      (i.toLong, text(if (tgt) tgtVocab else rawVocab, i), tgt)
    }
    val feats = Classifier
      .featurize(docs.toDF("doc_id", "text", "is_tgt"), col("is_tgt"))
      .localCheckpoint()
    // train on ids {0,1 mod 4}, hold out {2,3 mod 4} — both splits carry
    // both classes; holdout docs are never seen by fit
    val train = feats.filter(col("doc_id") % 4 < 2).localCheckpoint()
    val hold = feats.filter(col("doc_id") % 4 >= 2)
    val model = Classifier.fit(train, train.count())
    val verdicts = hold.select(
      ((model.marginCol(col("fx")) > 0) === (col("y") > 0.5)).as("ok"))
      .collect().map(_.getBoolean(0))
    assert(verdicts.nonEmpty && verdicts.forall(identity),
      s"holdout accuracy ${verdicts.count(identity)}/${verdicts.length}")
    // margin structure: target-vocab margins positive, raw negative,
    // with a real gap (not boundary-hugging)
    val margins = hold.select(col("y"), model.marginCol(col("fx")))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val minTgt = margins.filter(_._1 > 0.5).map(_._2).min
    val maxRaw = margins.filter(_._1 < 0.5).map(_._2).max
    assert(minTgt > 0 && maxRaw < 0 && minTgt - maxRaw > 0.5,
      s"margin gap too small: minTgt=$minTgt maxRaw=$maxRaw")
  }

  test("classifier tracks the linear-separability ceiling on an " +
      "overlapping fixture instead of hallucinating structure") {
    val sp = spark; import sp.implicits._
    // both classes share one common vocab; the target mixes in a marker
    // token only 70% of the time — Bayes-optimal linear accuracy is well
    // below 1.0, and the trained model must sit between majority-class
    // and ceiling
    val common = Seq("lorem", "ipsum", "dolor", "sit", "amet")
    def text(seed: Int, marked: Boolean): String = {
      val base = (0 until 7).map(i => common((seed * 5 + i) % common.size))
      (if (marked) base :+ "marker" else base).mkString(" ")
    }
    val docs = (0 until 200).map { i =>
      val tgt = i % 2 == 0
      // targets are the even ids, so i % 10 ∈ {0,2,4,6,8} — the < 7 cut
      // marks exactly 4 of those 5 residues: 80% of targets
      val marked = tgt && (i % 10 < 7)
      (i.toLong, text(i, marked), tgt)
    }
    val feats = Classifier
      .featurize(docs.toDF("doc_id", "text", "is_tgt"), col("is_tgt"))
      .localCheckpoint()
    val model = Classifier.fit(feats, feats.count())
    val acc = feats.select(
      ((model.marginCol(col("fx")) > 0) === (col("y") > 0.5)).as("ok"))
      .collect().count(_.getBoolean(0)).toDouble / docs.size
    // ceiling: marker ⇒ target (80% of targets), no-marker best guess =
    // raw (all raws + the unmarked 20% of targets) → 0.5 + 0.5·0.8 = 0.90;
    // the bases are identical token SETS, so no other signal exists
    assert(acc > 0.85 && acc <= 0.90, s"accuracy $acc outside the " +
      "ceiling band (0.85, 0.90] — under-trained or leaking")
    // SEEDED GRADIENT SAMPLE (the 100× scale path): each iteration sees
    // a deterministic ~half slice; the documented epsilon is a few
    // points around the full-batch fit — the widened band still sits
    // between majority-class and the 0.90 Bayes ceiling
    val mS = Classifier.fit(feats, feats.count(), sampleFrac = 0.5)
    val accS = feats.select(
      ((mS.marginCol(col("fx")) > 0) === (col("y") > 0.5)).as("ok"))
      .collect().count(_.getBoolean(0)).toDouble / docs.size
    assert(accS > 0.80 && accS <= 0.90,
      s"sampled-fit accuracy $accS outside (0.80, 0.90]")
    // determinism: the same seed reproduces the same model exactly —
    // per-iteration doc slices are pure functions of (doc, iter, seed)
    val mS2 = Classifier.fit(feats, feats.count(), sampleFrac = 0.5)
    assert(mS.bias == mS2.bias && mS.w.sameElements(mS2.w),
      "seeded sampled fit must be reproducible")
  }

  test("seeded gradient-sample fit still reaches 100% holdout on the " +
      "separable fixture (the r14 scale path)") {
    val sp = spark; import sp.implicits._
    val tgtVocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val rawVocab = Seq("zeta", "eta", "theta", "iota", "kappa")
    def text(vocab: Seq[String], seed: Int): String =
      (0 until 8).map(i => vocab((seed * 7 + i * 3) % vocab.size))
        .mkString(" ")
    val docs = (0 until 80).map { i =>
      val tgt = i % 2 == 0
      (i.toLong, text(if (tgt) tgtVocab else rawVocab, i), tgt)
    }
    val feats = Classifier
      .featurize(docs.toDF("doc_id", "text", "is_tgt"), col("is_tgt"))
      .localCheckpoint()
    val train = feats.filter(col("doc_id") % 4 < 2).localCheckpoint()
    val hold = feats.filter(col("doc_id") % 4 >= 2)
    val model = Classifier.fit(train, train.count(), sampleFrac = 0.5)
    val verdicts = hold.select(
      ((model.marginCol(col("fx")) > 0) === (col("y") > 0.5)).as("ok"))
      .collect().map(_.getBoolean(0))
    assert(verdicts.nonEmpty && verdicts.forall(identity),
      s"sampled holdout ${verdicts.count(identity)}/${verdicts.length}")
  }
}
