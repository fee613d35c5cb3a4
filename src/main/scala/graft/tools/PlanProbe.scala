package graft.tools

import graft.GraftSession
import graft.operators.Similarity

/** Scratch: print the IVF query's formatted plan to inspect partition
  * pruning on the list_id-partitioned assignments table. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Similarity.qAnnIvf(spark, d)
    q.write.format("noop").mode("overwrite").save()
    println("=== FORMATTED ===")
    println(q.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
