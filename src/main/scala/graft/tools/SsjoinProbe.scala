package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Graph, SetSim, TextOps}
import org.apache.spark.sql.functions._

/** Scratch profiling main for the ssjoin/clusters chain (not part of the
  * driver contract; used to attribute wall time to stages). */
object SsjoinProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val wr = t("withReps+checkpoint") { SetSim.withReps(spark, d).localCheckpoint() }
    val reps = t("reps checkpoint") {
      wr.filter(col("doc_id") === col("rep_id"))
        .select(col("doc_id"), col("toks")).localCheckpoint()
    }
    println(s"[probe] reps rows = ${reps.count()}")

    val freq = reps.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tok_freq"))
    val ordered = reps.select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("tok_freq"), col("tok")))).as("ft"))
      .select(col("doc_id"), expr("transform(ft, x -> x.tok)").as("otoks"))
      .withColumn("sz", size(col("otoks")))
      .withColumn("plen",
        col("sz") - floor((col("sz") * SetSim.ThreshNum + (SetSim.ThreshDen - 1)) / SetSim.ThreshDen) + 1)
    val prefix = t("ordered+prefix checkpoint") {
      ordered.select(col("doc_id"), col("sz"),
        posexplode(col("otoks")).as(Seq("pos", "tok")))
        .filter(col("pos") < col("plen"))
        .select(col("tok"), col("pos"), col("doc_id"), col("sz"))
        .localCheckpoint()
    }
    println(s"[probe] prefix rows = ${prefix.count()}")

    val Salts = 16
    val HotCut = 256L
    val pfreq = prefix.groupBy(col("tok")).agg(count(lit(1)).as("pf"))
    val ptagged = prefix.join(pfreq, "tok").withColumn("hot", col("pf") >= HotCut)
    val left = ptagged.select(col("tok"),
      when(col("hot"), pmod(xxhash64(col("doc_id")), lit(Salts)).cast("int"))
        .otherwise(lit(0)).as("salt"),
      col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("pos").as("pos_a"))
    val right = ptagged.select(col("tok"),
      explode(when(col("hot"), sequence(lit(0), lit(Salts - 1)))
        .otherwise(array(lit(0)))).as("salt"),
      col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("pos").as("pos_b"))
    val rawCands = left.join(right, Seq("tok", "salt"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(greatest(col("sz_a"), col("sz_b")) * SetSim.ThreshNum
        <= least(col("sz_a"), col("sz_b")) * SetSim.ThreshDen)
    t("raw candidate rows") { println(s"[probe]   = ${rawCands.count()}") }
    val cands = rawCands
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("pos_a")).as("i"), min(col("pos_b")).as("j"),
        first(col("sz_a")).as("sza"), first(col("sz_b")).as("szb"))
      .filter((lit(1) + least(col("sza") - col("i") - 1, col("szb") - col("j") - 1))
        * (SetSim.ThreshNum + SetSim.ThreshDen) >= (col("sza") + col("szb")) * SetSim.ThreshNum)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    t("cands after pos-filter") { println(s"[probe]   = ${cands.count()}") }

    val ta = reps.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val tb = reps.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    val verified = t("verify join+checkpoint") {
      cands.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn("inter_n", size(array_intersect(col("toks_a"), col("toks_b"))))
        .withColumn("union_n", size(col("toks_a")) + size(col("toks_b")) - col("inter_n"))
        .filter(col("inter_n") * SetSim.ThreshDen >= col("union_n") * SetSim.ThreshNum)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
    }
    println(s"[probe] verified pairs = ${verified.count()}")
    t("connectedComponents") {
      Graph.connectedComponents(verified, "doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
