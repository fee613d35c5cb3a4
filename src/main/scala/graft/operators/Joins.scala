package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-resilient join utilities.
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime, but the
  * classic explicit remedy — salting the hot keys — is still the tool when
  * a single key's rows exceed one executor's memory, or when the skewed
  * side feeds an aggregation. Provided as a semantics-preserving combinator:
  * the salted plan returns EXACTLY the rows of the plain join (proved by the
  * oracle query below).
  */
object Joins {

  /** Salted inner equi-join: the big (skewed) side gets a random salt in
    * [0, salts); the small side is replicated `salts`× with every salt
    * value; joining on (key, salt) spreads each hot key over `salts`
    * reducers. Row multiset is identical to the plain join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = big.withColumn("_salt", (rand(42) * salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Oracle-checked query: lineitem (the "skewed" fact) salt-joined to
    * orders, aggregated — results must equal the plain join's (the oracle
    * SQL is the UNsalted join, so the hash-compare proves salting is
    * semantics-preserving). */
  def qSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(li, ord, "l_orderkey", 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(12,4)")).cast("double").as("sum_qty"))
  }

  def qSaltedJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      | CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Two-phase (partial-on-salt) aggregation for skewed group keys: a
    * pre-aggregation on (key, salt) shrinks the hot groups before the final
    * shuffle on key alone — Catalyst's partial aggregation already does this
    * for algebraic aggs; the explicit form matters for `collect_list`-class
    * aggregations where map-side combine doesn't shrink data. */
  def twoPhaseDistinct(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df.withColumn("_salt", (rand(42) * salts).cast("int"))
      .groupBy(key.as("key"), col("_salt"))
      .agg(collect_set(value).as("vals"))
      .groupBy(col("key"))
      .agg(array_distinct(flatten(collect_list(col("vals")))).as("distinct_vals"))
}
