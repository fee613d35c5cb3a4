package graft

import graft.operators.{SetSim, TextOps}
import graft.streaming.DedupLoop
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming ingest+dedup loop must equal the batch computation:
  * decisions accumulated over N rounds = the union of each round's
  * new-vs-priorhistory batch dedup, with re-runs as no-ops. */
class DedupLoopSpec extends GraftSpec {

  private def docs = Tables.documents(spark, sf)

  private def slice(lo: Int, hi: Int): DataFrame =
    docs.filter(col("doc_id") >= lo && col("doc_id") < hi)

  private def sided(df: DataFrame, side: String): DataFrame =
    df.select(col("doc_id"),
        array_sort(array_distinct(TextOps.tokens(col("text")))).as("toks"))
      .withColumn("side", lit(side))

  private def expectedRound(histHi: Int, newLo: Int, newHi: Int): Set[(Long, Long)] =
    SetSim.dedupNewVsHistory(
        sided(slice(0, histHi), "h").unionByName(sided(slice(newLo, newHi), "n")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def decisionsIn(dir: String): Set[(Long, Long)] =
    DedupLoop.decisions(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet

  test("ingest+dedup rounds equal the batch decisions on the union") {
    val t = Files.createTempDirectory("graft_deduploop").toString
    val (landing, ledger, dec) = (s"$t/landing", s"$t/ledger", s"$t/dec")
    def land(lo: Int, hi: Int, parts: Int): Unit =
      slice(lo, hi).repartition(parts).write.mode("append").parquet(landing)

    land(0, 300, 3)
    assert(DedupLoop.ingestAndDedup(spark, landing, ledger, dec) == 3)
    assert(decisionsIn(dec).isEmpty, "first batch has no history to match")

    land(300, 400, 2)
    assert(DedupLoop.ingestAndDedup(spark, landing, ledger, dec) == 2)
    val e2 = expectedRound(300, 300, 400)
    assert(decisionsIn(dec) == e2, "round 2 = N1 vs H")

    land(400, 500, 2)
    assert(DedupLoop.ingestAndDedup(spark, landing, ledger, dec) == 2)
    val e3 = expectedRound(400, 400, 500)
    assert(decisionsIn(dec) == e2 ++ e3, "round 3 adds N2 vs H∪N1")
    assert(e2.nonEmpty && e3.nonEmpty, "slices must actually contain near-dups")

    // re-run with nothing new: a no-op (ledger exactly-once)
    assert(DedupLoop.ingestAndDedup(spark, landing, ledger, dec) == 0)
    assert(decisionsIn(dec) == e2 ++ e3)
  }

  test("a crash between ingest and decisions heals on the next round") {
    val t = Files.createTempDirectory("graft_deduploop_c").toString
    val (landing, ledger, dec) = (s"$t/landing", s"$t/ledger", s"$t/dec")
    slice(0, 300).repartition(3).write.mode("append").parquet(landing)
    DedupLoop.ingestAndDedup(spark, landing, ledger, dec)
    // simulate the crash window: files ingested into the ledger directly,
    // no decisions written for that snapshot
    slice(300, 400).repartition(2).write.mode("append").parquet(landing)
    graft.sources.Lake.ingestNewFiles(spark, landing, ledger)
    assert(decisionsIn(dec).isEmpty, "snapshot 2 not yet decided")
    // next round ingests nothing new but must catch up on snapshot 2
    assert(DedupLoop.ingestAndDedup(spark, landing, ledger, dec) == 0)
    assert(decisionsIn(dec) == expectedRound(300, 300, 400),
      "undecided snapshot healed by the next round")
  }

  test("streaming form: availableNow micro-batches drive the same rounds") {
    val t = Files.createTempDirectory("graft_deduploop_s").toString
    val (landing, ledger, dec, ckpt) =
      (s"$t/landing", s"$t/ledger", s"$t/dec", s"$t/ckpt")
    val schema = docs.schema

    slice(0, 300).repartition(3).write.mode("append").parquet(landing)
    val q1 = DedupLoop.dedupStream(spark, landing, ledger, dec, ckpt, schema)
    q1.awaitTermination()
    assert(decisionsIn(dec).isEmpty)

    slice(300, 400).repartition(2).write.mode("append").parquet(landing)
    val q2 = DedupLoop.dedupStream(spark, landing, ledger, dec, ckpt, schema)
    q2.awaitTermination()
    assert(decisionsIn(dec) == expectedRound(300, 300, 400),
      "streaming round = batch N1 vs H")
  }
}
