package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","64")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/sf1_synth"
    // synthesize ~sf1: replicate lineitem/orders 10x with shifted keys
    if (!new java.io.File(out).exists()) {
      new java.io.File(out).mkdirs()
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val ord = spark.read.parquet(s"$src/orders.parquet")
      val maxOk = ord.agg(max("o_orderkey")).head().getLong(0) + 1
      def rep(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String]) =
        (0 until 10).map { i =>
          keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * maxOk)))
        }.reduce(_ union _)
      rep(li, Seq("l_orderkey")).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      rep(ord, Seq("o_orderkey")).write.mode("overwrite").parquet(s"$out/orders.parquet")
      for (t <- Seq("customer","supplier","nation","region","part","events","documents","embeddings"))
        spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println("lineitem rows: " + spark.read.parquet(s"$out/lineitem.parquet").count())
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import graft.operators._
    for ((n, q) <- Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "q1_agg" -> (Relational.q1Agg _), "q3_join_agg" -> (Relational.q3JoinAgg _),
      "q5_multi_join" -> (Relational.q5MultiJoin _), "q_window_rank" -> (Relational.qWindowRank _),
      "q_topk_group" -> (TopK.qTopkGroup _), "q_range_join" -> (Relational2.qRangeJoin _)))
      time(n) { q(spark, out).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
