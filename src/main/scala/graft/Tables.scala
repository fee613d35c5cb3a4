package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the star-schema tables (see TESTDATA.md).
  *
  * Scale note: each loader is a plain parquet scan so Catalyst can push
  * filters/projections into the file source. At 100 TB the fact tables
  * (lineitem, orders, events, documents, embeddings) would be
  * date/bucket-partitioned; dims (region, nation, supplier, part, customer)
  * stay broadcast-sized relative to facts.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `documents` widened to the session shuffle width when the file
    * layout scans NARROWER than it (r17, guide §2/§6): parquet cannot
    * split a single row group, so a KB-scale compressed corpus scans as
    * ONE task — while the text operators above the scan expand every row
    * ~100-1000× (tokenize, bigram explode, regex token proxies), pinning
    * the whole pipeline head to one core. Hash-repartition on doc_id
    * (deterministic, skew-free; round-robin would pay the
    * sort-before-repartition pass). A corpus already at least
    * session-width wide — every real many-file deployment — passes
    * through untouched: the exchange exists exactly when the scan cannot
    * feed the cores. Only for operators whose scan-side work dominates;
    * cheap single-agg readers keep the bare loader. */
  def documentsWide(s: SparkSession, d: String): DataFrame = {
    val df = documents(s, d)
    val width = s.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= width) df
    else df.repartition(width, org.apache.spark.sql.functions.col("doc_id"))
  }
}
