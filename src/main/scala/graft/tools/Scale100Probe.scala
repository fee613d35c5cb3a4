package graft.tools

import graft.GraftSession
import graft.operators.{Relational, TopK}
import org.apache.spark.sql.functions._

/** One-off 100× scan-path probe: replicates sf0.1's lineitem/orders to
  * ~60M/15M rows (100× the sf0.1 row counts) and times the scan-bound and
  * join-bound headline queries at 1×/10×/100× — the sustained-linearity
  * record behind SURVEY §6. Writes nothing outside /tmp. */
object Scale100Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/sf10_synth"
    if (!new java.io.File(out).exists()) {
      new java.io.File(out).mkdirs()
      val ord = spark.read.parquet(s"$src/orders.parquet")
      val maxOk = ord.agg(max("o_orderkey")).head().getLong(0) + 1
      def rep(df: org.apache.spark.sql.DataFrame, k: String) =
        spark.range(100).select(col("id")).crossJoin(df)
          .withColumn(k, col(k) + col("id") * maxOk).drop("id")
      rep(spark.read.parquet(s"$src/lineitem.parquet"), "l_orderkey")
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      rep(ord, "o_orderkey")
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      for (t <- Seq("customer", "supplier", "nation", "region", "part"))
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println("lineitem rows: " + spark.read.parquet(s"$out/lineitem.parquet").count())
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for ((n, q) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
        "q1_agg" -> (Relational.q1Agg _),
        "q6_selective_agg" -> (Relational.q6SelectiveAgg _),
        "q3_join_agg" -> (Relational.q3JoinAgg _),
        "q_topk_group" -> (TopK.qTopkGroup _))) {
      q(spark, src).write.format("noop").mode("overwrite").save() // warm-up
      val t1 = timed { q(spark, src).write.format("noop").mode("overwrite").save() }
      val t100 = timed { q(spark, out).write.format("noop").mode("overwrite").save() }
      println(f"$n%-18s 1x ${t1}%6.2f s   100x ${t100}%7.2f s   ratio ${t100 / t1}%6.1f")
    }
    spark.stop()
  }
}
