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

  /** Generalized AS-OF JOIN — the merge-asof operator Spark lacks as a
    * built-in (pandas merge_asof / kdb aj / QuestDB-DuckDB ASOF JOIN):
    * every left row picks up the LATEST right row with the same key whose
    * timestamp is AT OR BEFORE its own. The scalable shape is NOT a range
    * join (no per-row subquery, no interval explosion): tag both sides,
    * UNION them, and take one running `last(_, ignoreNulls)` over a
    * (keys)-partitioned (ts, side) window — both sides shuffle exactly
    * once on the keys, state is one row per frame position, and the right
    * side sorts BEFORE the left at equal timestamps so ties match
    * (at-or-before includes equality).
    *
    * The matched right row lands as one STRUCT column `matched` carrying
    * every non-key right column (null when nothing precedes — left-outer
    * semantics; filter `matched.isNotNull` for inner). `tolerance` (an
    * interval Column, e.g. `expr("INTERVAL 1 HOUR")`) nulls matches
    * older than `leftTs − tolerance`, evaluated row-locally after the
    * window. Right rows should be unique per (keys, rightTs) — pre-
    * aggregate ties (the window would pick one deterministically only
    * with a caller-supplied order). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rightVals = right.columns.filterNot(keys.contains).map(col)
    val matchType = right.select(struct(rightVals: _*).as("m"))
      .schema("m").dataType
    val leftCols = left.columns.map(col)
    val lpart = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__t"), lit(1).as("__side"),
        struct(leftCols: _*).as("__lrow"),
        lit(null).cast(matchType).as("__m")): _*)
    val rpart = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"), lit(0).as("__side"),
        lit(null).cast(lpart.schema("__lrow").dataType).as("__lrow"),
        struct(rightVals: _*).as("__m")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lpart.unionByName(rpart)
      .withColumn("__asof", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) => matched.withColumn("__asof",
        when(col(s"__asof.$rightTs") >= col("__t") - tol, col("__asof")))
      case None => matched
    }
    bounded.select(col("__lrow.*"), col("__asof").as("matched"))
  }

  /** AS-OF JOIN, oracle-checked against DuckDB's NATIVE `ASOF JOIN`
    * operator (a real independent implementation of the semantics, not a
    * window re-derivation): each purchase matched to its user's latest
    * at-or-before view. Right ties pre-collapsed to max event_id per
    * (user, ts) on both engines; inner form (unmatched filtered). */
  def qEvtAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Events.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max(col("event_id")).as("view_id"))
    asofJoin(purchases, views, Seq("user_id"), "ts", "view_ts")
      .filter(col("matched").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("matched.view_id").as("view_id"),
        col("matched.view_ts").as("view_ts"))
  }

  def qEvtAsofJoinSql: String =
    """WITH v AS (SELECT user_id, ts AS view_ts, max(event_id) AS view_id
      |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |     p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts, v.view_id, v.view_ts
      |FROM p ASOF JOIN v
      |  ON p.user_id = v.user_id AND p.ts >= v.view_ts""".stripMargin
}
