package graft

import graft.sources.{GraftTable, Lake}
import graft.streaming.JoinView
import graft.streaming.JoinView.JoinAggSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Two-sided join-aggregate IVM: after any mix of fact-side and
  * dim-side waves (updates, inserts, deletes — including join-KEY
  * updates that move a fact between groups), the maintained view
  * BIT-EQUALS the from-scratch recompute of aggregate(A ⋈ B); rounds
  * with nothing new no-op; the streaming form folds and replays
  * safely. */
class JoinViewSpec extends GraftSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("maintained join view == recompute across one-sided, both-sided, " +
      "delete, and key-move waves; no-op rounds; streaming form") {
    val sp = spark; import sp.implicits._
    val tmp = Files.createTempDirectory("graft_jv").toString
    val facts = GraftTable(spark, s"$tmp/f_ledger", s"$tmp/f_gen")
    val dims = GraftTable(spark, s"$tmp/d_ledger", s"$tmp/d_gen")
    // facts (k=join key, v=measure), dims (k, grp)
    (1L to 200L).map(i => (i, i % 13, (i * 10 + i % 3).toString))
      .toDF("id", "k", "v")
      .withColumn("v", col("v").cast("double"))
      .write.parquet(s"$tmp/f_landing")
    facts.ingest(s"$tmp/f_landing", statsCols = Seq("id", "k"))
    (0L to 12L).map(i => (i, s"g${i % 4}")).toDF("k", "grp")
      .write.parquet(s"$tmp/d_landing")
    dims.ingest(s"$tmp/d_landing", statsCols = Seq("k"))

    val spec = JoinAggSpec("k", "k", Seq("grp"), Seq("v"))
    // NOTE: same-named join key works because joined() drops B's copy
    val viewDir = s"$tmp/view"
    JoinView.bootstrap(spark, facts.ledgerDir, dims.ledgerDir, viewDir, spec)

    def recompute() =
      JoinView.aggregate(facts.read(), dims.read(), spec)
    def check(tag: String): Unit =
      assert(canon(JoinView.view(spark, viewDir)) == canon(recompute()),
        s"$tag: maintained view diverged from recompute")
    check("bootstrap")

    // fact wave: update measures, move a fact to ANOTHER join key,
    // insert new facts, delete some
    facts.merge(Seq(
      (5L, 5L % 13, 999.5), // measure update
      (6L, 11L, 60.0), // JOIN-KEY move: leaves k=6's group, joins k=11's
      (300L, 2L, 42.25), (301L, 3L, 7.75)) // inserts
      .toDF("id", "k", "v"), "id", changeFeed = true)
    facts.merge(Seq((7L, 7L, 0.0)).toDF("id", "k", "v"), "id",
      deleteWhen = Some(lit(true)), changeFeed = true)
    JoinView.applyRound(spark, facts.ledgerDir, dims.ledgerDir,
      viewDir, spec)
    check("fact wave")

    // dim wave: move a group, delete a dim key (its facts leave)
    dims.merge(Seq((2L, "gMOVED")).toDF("k", "grp"), "k", changeFeed = true)
    dims.merge(Seq((3L, "x")).toDF("k", "grp"), "k",
      deleteWhen = Some(lit(true)), changeFeed = true)
    JoinView.applyRound(spark, facts.ledgerDir, dims.ledgerDir,
      viewDir, spec)
    check("dim wave")

    // BOTH sides in one round: fact inserts + dim re-insert of the
    // deleted key (its surviving facts come BACK)
    facts.merge(Seq((302L, 3L, 11.0)).toDF("id", "k", "v"), "id",
      changeFeed = true)
    dims.merge(Seq((3L, "gBACK")).toDF("k", "grp"), "k", changeFeed = true)
    JoinView.applyRound(spark, facts.ledgerDir, dims.ledgerDir,
      viewDir, spec)
    check("both-sides round")

    // no-op round: cursors unchanged
    val cur = JoinView.applyRound(spark, facts.ledgerDir, dims.ledgerDir,
      viewDir, spec)
    assert(JoinView.applyRound(spark, facts.ledgerDir, dims.ledgerDir,
      viewDir, spec) == cur, "round with nothing new must not advance")
    check("no-op round")

    // streaming form folds a late wave; a second run replays to no-op
    facts.merge(Seq((303L, 4L, 13.5)).toDF("id", "k", "v"), "id",
      changeFeed = true)
    JoinView.maintainOnce(spark, facts.ledgerDir, dims.ledgerDir,
      viewDir, spec, s"$tmp/ckpt")
    check("streamed wave")
    JoinView.maintainOnce(spark, facts.ledgerDir, dims.ledgerDir,
      viewDir, spec, s"$tmp/ckpt")
    check("stream restart (no-op)")

    // exact decimal discipline: the sums are DECIMAL(28,4), never double
    val schema = JoinView.view(spark, viewDir).schema
    assert(schema("sum_v").dataType.simpleString == "decimal(28,4)",
      s"sum column must stay exact decimal, got ${schema("sum_v").dataType}")
  }
}
