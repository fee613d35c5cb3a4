package graft

import graft.operators.{Sketches, TextOps}
import graft.Tables
import org.apache.spark.sql.functions._

class SketchSpec extends GraftSpec {

  test("heavy hitters: every true heavy hitter surfaces, estimates bounded") {
    val support = 0.005
    val toks = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val out = Sketches.qTokHeavyHitters(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // recall: exact frequency > support*N => KPS keeps it as a candidate
    // and the CMS estimate (>= exact > threshold) survives the cut
    val truly = exact.filter(_._2 > (support * n).toLong)
    truly.foreach { case (t, c) =>
      assert(out.contains(t), s"true heavy hitter $t ($c of $n) missing")
    }
    // CMS never underestimates; overestimate bounded (eps=1e-4, 2x slack)
    out.foreach { case (t, est) =>
      val ex = exact.getOrElse(t, 0L)
      assert(est >= ex, s"$t: CMS underestimated $est < $ex")
      assert(est <= ex + (2e-4 * n).toLong + 1, s"$t: estimate $est vs $ex")
    }
  }

  test("KLL quantile sketches: every estimate's true rank within bound, " +
      "merged row bounds the GLOBAL distribution") {
    val fracs = Seq(0.10, 0.50, 0.90, 0.99)
    // KLL k=200 single-sided normalized rank error ~1.65% @99% conf; the
    // tie-robust check below needs no extra slack beyond a safety margin.
    val eps = 0.025
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("double").as("v"))
      .collect().groupBy(_.getString(0)).map { case (s, rs) =>
        s -> rs.map(_.getDouble(1)).sorted
      }
    val all = bySource.values.flatten.toArray.sorted
    val out = Sketches.qDocLenQuantiles(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet == bySource.keySet + "__all__")
    out.foreach { r =>
      val vals = if (r.getString(0) == "__all__") all else bySource(r.getString(0))
      assert(r.getLong(1) == vals.length, s"${r.getString(0)}: n_docs")
      val ests = Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      fracs.zip(ests).foreach { case (f, est) =>
        // tie-robust two-sided rank bound: the mass strictly below the
        // estimate must not exceed f+eps, the mass at-or-below must
        // reach f-eps — exact ranks via binary-search on the sorted list
        val le = vals.count(_ <= est).toDouble / vals.length
        val lt = vals.count(_ < est).toDouble / vals.length
        assert(le >= f - eps, s"${r.getString(0)} p$f: rank(<=$est)=$le too low")
        assert(lt <= f + eps, s"${r.getString(0)} p$f: rank(<$est)=$lt too high")
      }
    }
  }

  test("HLL distinct sketches: per-source and union estimates within 3%") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), md5(col("text")).as("h"))
    val exact = docs.groupBy("source")
      .agg(countDistinct("h").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = docs.select("h").distinct().count()
    val out = Sketches.qDocDistinctSketch(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == exact.keySet + "__all__")
    (exact + ("__all__" -> exactAll)).foreach { case (src, ex) =>
      val est = out(src)
      assert(math.abs(est - ex).toDouble / ex < 0.03,
        s"$src: est $est vs exact $ex")
    }
    // the union is a register merge: it must estimate the TRUE global
    // distinct (shared docs across sources collapse), not the sum
    val sum = exact.values.sum
    if (exactAll < (sum * 0.97).toLong) // only meaningful if overlap exists
      assert(out("__all__") < sum)
  }
}
