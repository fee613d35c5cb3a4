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
    * reducers. Row multiset is identical to the plain join. Salting EVERY
    * key replicates the whole small side — pay that only for keys that need
    * it (see skewSaltedJoin, the deployable form). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = big.withColumn("_salt", (rand(42) * salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Hot-key-only salted join — the form that is actually deployable at
    * 100 TB: only keys whose big-side frequency exceeds `hotThreshold` take
    * the salted path (replicating only THEIR small-side rows `salts`×); the
    * cold remainder runs the plain shuffle join, and the two halves union.
    *
    * Hot keys are detected from a `sampleFraction` sample of the big side —
    * a full frequency pass at 100 TB costs as much as the join itself. The
    * split is purely a ROUTING decision: whichever path a key lands on, its
    * output rows are identical, so sampling error can never change results
    * (the oracle hash-compare proves it). The hot-key set is bounded by
    * construction (≤ |big|·fraction / cutoff keys), so broadcasting it is
    * always safe. */
  def skewSaltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, hotThreshold: Long, sampleFraction: Double = 1.0): DataFrame = {
    val sampled = if (sampleFraction >= 1.0) big else big.sample(sampleFraction, 7L)
    val cutoff = math.max(1L, (hotThreshold * sampleFraction).toLong)
    val hot = sampled.groupBy(col(key))
      .agg(count(lit(1)).as("_freq"))
      .filter(col("_freq") > cutoff)
      .select(col(key))

    val bigHot = big.join(broadcast(hot), Seq(key), "left_semi")
    val bigCold = big.join(broadcast(hot), Seq(key), "left_anti")
    val smallHot = small.join(broadcast(hot), Seq(key), "left_semi")
    val smallCold = small.join(broadcast(hot), Seq(key), "left_anti")

    val saltedHot = bigHot.withColumn("_salt", (rand(42) * salts).cast("int"))
      .join(smallHot.withColumn("_salt",
        explode(array((0 until salts).map(lit): _*))), Seq(key, "_salt"))
      .drop("_salt")
    bigCold.join(smallCold, Seq(key)).unionByName(saltedHot)
  }

  /** Oracle-checked query: lineitem (the "skewed" fact) hot-key-salt-joined
    * to orders, aggregated — results must equal the plain join's (the oracle
    * SQL is the UNsalted join, so the hash-compare proves the split+salt is
    * semantics-preserving). The threshold is set so both the salted and the
    * plain path carry rows at every test SF. */
  def qSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    skewSaltedJoin(li, ord, "l_orderkey", salts = 8, hotThreshold = 4)
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
