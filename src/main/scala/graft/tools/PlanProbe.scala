package graft.tools

import graft.GraftSession

/** Plan scratch tool: run any SparkEntry query against any data dir and
  * print its FINAL adaptive plan (joins summary + head) — `runMain
  * graft.tools.PlanProbe <query> [dir]`. Used to audit join-strategy
  * choices on the synthetic scale dirs (/tmp/sf1_synth, /tmp/sf10_synth). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_ann_ivf")
    val d = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)(spark, d)
    q.write.format("noop").mode("overwrite").save() // warm-up
    val t0 = System.nanoTime()
    q.write.format("noop").mode("overwrite").save()
    println(f"timed noop run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    q.collect() // finalize THIS queryExecution's adaptive plan
    val p = q.queryExecution.executedPlan.toString
    println(s"=== $name @ $d ===")
    for (j <- Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct"))
      println(f"$j%-24s ${j.r.findAllIn(p).size}")
    println(p.take(6000))
    spark.stop()
  }
}
