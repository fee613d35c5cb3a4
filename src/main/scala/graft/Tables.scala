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
}
