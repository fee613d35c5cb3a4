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

    // --- skew probe: one key holds 30% of a 6M-row fact; the dim side is
    // too wide to broadcast (threshold forced off) and AQE's skew-join
    // mitigation is disabled — the regime where explicit salting is the
    // only remedy. skewSaltedJoin must beat the plain shuffle join here.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val skewBig = spark.range(6000000).select(
      when(rand(1) < 0.3, lit(7L))
        .otherwise((rand(2) * 2000000).cast("long")).as("k"),
      rand(3).as("v")).localCheckpoint()
    val skewSmall = spark.range(2000001).select(col("id").as("k"),
      (col("id") % 5).cast("long").as("grp"),
      concat(lit("payload_"), col("id")).as("pad")).localCheckpoint()
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy("grp").agg(sum("v").as("sv"))
    time("skew_plain_join") { agg(skewBig.join(skewSmall, "k"))
      .write.format("noop").mode("overwrite").save() }
    time("skew_salted_join") { agg(Joins.skewSaltedJoin(skewBig, skewSmall, "k",
        salts = 32, hotThreshold = 100000, sampleFraction = 0.01))
      .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
