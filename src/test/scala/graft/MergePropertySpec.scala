package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Randomized property test for the copy-on-write MERGE: for several
  * seeded random (update, insert, delete) source mixes, the merged table
  * must equal the relational definition computed directly on DataFrames —
  * carry(unmatched target) ∪ surviving source — and time travel must
  * return the pre-merge rows exactly. */
class MergePropertySpec extends GraftSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Double)] =
    df.select(col("c_custkey"), col("c_acctbal").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("merge equals its relational definition for random source mixes") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    for (seed <- 1 to 3) {
      val t0 = Files.createTempDirectory(s"graft_merge_prop_$seed").toString
      cust.repartitionByRange(3, col("c_custkey"))
        .write.parquet(s"$t0/landing")
      Lake.ingestNewFiles(spark, s"$t0/landing", s"$t0/ledger")
      val preSnap = Lake.currentSnapshot(spark, s"$t0/ledger")
      val pre = rows(Lake.readAt(spark, s"$t0/ledger", preSnap))

      // seeded random mix: ~20% of keys updated, ~10% inserted fresh,
      // deletes = updated rows in one random segment
      val marked = cust
        .withColumn("u", pmod(xxhash64(col("c_custkey"), lit(seed)), lit(100)))
      val updates = marked.filter(col("u") < 20)
        .withColumn("c_acctbal", col("c_acctbal") + seed)
      val inserts = marked.filter(col("u") >= 90)
        .withColumn("c_custkey", col("c_custkey") + 5000000L * seed)
      val delSeg = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")(seed % 3)
      val source = updates.unionByName(inserts).drop("u")
      val snap = Lake.mergeInto(spark, s"$t0/ledger", s"$t0/gen", source,
        "c_custkey", deleteWhen = Some(col("c_mktsegment") === delSeg))

      // relational definition: target rows with unmatched keys ∪ matched
      // source rows not marked for delete ∪ ALL unmatched source rows
      // (deleteWhen governs matched rows only — SQL MERGE arm semantics)
      val tgtKeys = cust.select(col("c_custkey"))
      val srcLive = source
        .join(tgtKeys, Seq("c_custkey"), "left_semi")
        .filter(col("c_mktsegment") =!= delSeg)
        .unionByName(source.join(tgtKeys, Seq("c_custkey"), "left_anti"))
      val expected = rows(
        cust.join(source.select(col("c_custkey")), Seq("c_custkey"), "left_anti")
          .unionByName(srcLive))
      assert(rows(Lake.readAt(spark, s"$t0/ledger", snap)) == expected,
        s"seed $seed: merged table must equal the relational definition")
      assert(rows(Lake.readAt(spark, s"$t0/ledger", preSnap)) == pre,
        s"seed $seed: pre-merge snapshot must be unchanged")
    }
  }
}
