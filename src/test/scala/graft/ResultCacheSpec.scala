package graft

import graft.sources.{Lake, ResultCache}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Result cache (sources/ResultCache.scala): plan+data fingerprinting —
  * a re-built identical query HITS (proven by serving after the source
  * data is physically gone), a data change MISSES (merge → fresh
  * result), different queries key apart, torn entries recompute. */
class ResultCacheSpec extends GraftSpec {

  test("hit without recompute, snapshot-precise invalidation, torn-entry " +
      "recovery") {
    val t = Files.createTempDirectory("graft_rc_spec").toString
    val (landing, ledger, gen, cache) =
      (s"$t/landing", s"$t/ledger", s"$t/gen", s"$t/cache")
    spark.read.parquet(s"$sf/customer.parquet")
      .repartition(4).write.parquet(landing)
    Lake.ingestNewFiles(spark, landing, ledger)
    val s1 = Lake.currentSnapshot(spark, ledger)
    def q() = Lake.readAt(spark, ledger, Lake.currentSnapshot(spark, ledger))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("c_acctbal").cast("decimal(12,4)")).as("bal"))
    val fp1 = ResultCache.fingerprint(q())
    // two INDEPENDENTLY built frames of the same query fingerprint equal
    assert(ResultCache.fingerprint(q()) == fp1)
    val r1 = ResultCache.through(q(), cache).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    // ...and a different query keys apart
    val other = q().filter(col("c_mktsegment") =!= "MACHINERY")
    assert(ResultCache.fingerprint(other) != fp1)
    // HIT proof: physically stash the table's data files — the cached
    // entry must still serve the result without touching them (the
    // frame is built first: plan CONSTRUCTION legitimately reads a
    // schema footer; the cache replaces the COMPUTE)
    val qd = q()
    val live = Lake.filesAt(spark, ledger, s1)
      .select("path").collect().map(_.getString(0))
    val stash = s"$t/stash"
    new java.io.File(stash).mkdirs()
    live.foreach { p =>
      val f = new java.io.File(p.replaceFirst("^file:/+", "/"))
      assert(f.renameTo(new java.io.File(stash, f.getName)))
    }
    val served = ResultCache.through(qd, cache).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(served == r1, "cache hit did not serve the materialized result")
    // restore the files, merge -> the file set changes -> MISS + fresh rows
    live.foreach { p =>
      val f = new java.io.File(p.replaceFirst("^file:/+", "/"))
      assert(new java.io.File(stash, f.getName).renameTo(f))
    }
    Lake.mergeInto(spark, ledger, gen,
      spark.read.parquet(s"$sf/customer.parquet")
        .filter(col("c_mktsegment") === "MACHINERY")
        .withColumn("c_acctbal", col("c_acctbal") + 1000),
      "c_custkey")
    val fp2 = ResultCache.fingerprint(q())
    assert(fp2 != fp1, "data change did not change the fingerprint")
    val r2 = ResultCache.through(q(), cache).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(r2("MACHINERY") != r1("MACHINERY"))
    assert(r2("BUILDING") == r1("BUILDING"))
    // torn entry: nuke _SUCCESS -> recompute lands a fresh valid entry
    assert(new java.io.File(s"$cache/$fp2/_SUCCESS").delete())
    val r3 = ResultCache.through(q(), cache).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(r3 == r2)
  }
}
