package graft

import graft.operators.{TextIndex, TextOps}
import org.apache.spark.sql.functions._

/** Inverted text index: search equals the direct token-scan baseline,
  * posting files prune at the manifest level for selective terms, and
  * the text column never enters the query plan. */
class TextIndexSpec extends GraftSpec {

  test("index search == contains-scan baseline; manifest prunes posting " +
      "files; the query never reads text") {
    val terms = Seq("spark", "merge", "window")
    val got = TextIndex.search(spark, sf, terms).collect()
      .map(_.getLong(0)).toSet
    val baseline = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(terms.map(t => array_contains(col("toks"), t)).reduce(_ && _))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == baseline, s"index diverged: ${got.size} vs ${baseline.size}")
    assert(got.nonEmpty)
    // a RARE term's search must open fewer posting files than the index
    // holds (token-clustered files + stats/bloom pruning); find a rare
    // token from the corpus
    val rare = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count"), col("t"))
      .head().getString(0)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // finalize the adaptive plan + populate metrics
      df.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.metrics("numFiles").value
      }.sum
    }
    val all = TextIndex.postings(spark, sf)
    val total = all.inputFiles.length
    val pruned = scannedFiles(all.filter(col("token") === rare))
    assert(total >= 4, s"index not multi-file ($total)")
    assert(pruned < total,
      s"rare-term search read all $total posting files (no pruning)")
    // text never in the plan
    val plan = TextIndex.search(spark, sf, terms)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("text#") && !plan.contains("documents.parquet"),
      "search plan references the text column / the corpus scan")
  }
}
