package graft

import graft.operators.{Events, Joins}
import graft.sources.Lake
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LakeSpec extends GraftSpec {

  test("partitioned write prunes partitions on read and round-trips rows") {
    val out = Files.createTempDirectory("graft_lake").toString
    val events = Events.events(spark, sf)
    Lake.writeEventsPartitioned(events, out)

    // directory layout: event_date=... / event_hour=...
    val dateDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dateDirs.nonEmpty && dateDirs.forall(_.getName.startsWith("event_date=")))

    val back = Lake.readEvents(spark, out)
    assert(back.count() == events.count())

    // partition pruning: a date predicate must reduce the files read
    val oneDay = back.filter(col("event_date") === "2024-01-03")
    val p = oneDay.queryExecution.executedPlan.toString
    assert(oneDay.count() > 0)
    assert(p.contains("PartitionFilters: [isnotnull(event_date"),
      s"date predicate did not become a partition filter:\n${p.take(800)}")
  }

  test("compaction hits the target file count") {
    val out = Files.createTempDirectory("graft_compact_in").toString
    val outC = Files.createTempDirectory("graft_compact_out").toString
    Events.events(spark, sf).repartition(16).write.mode("overwrite").parquet(out)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet")) == 16)
    Lake.compact(spark, out, outC, targetRowsPerFile = 500)
    val files = new java.io.File(outC).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 2, s"expected 1000 rows / 500 per file = 2 files, got $files")
    assert(spark.read.parquet(outC).count() == 1000)
  }

  test("manifest aggregates per-partition counts and checksums") {
    val out = Files.createTempDirectory("graft_manifest").toString
    Lake.writeEventsPartitioned(Events.events(spark, sf), out)
    val m = Lake.manifest(spark, out).collect()
    assert(m.map(_.getAs[Long]("n_rows")).sum == 1000)
    assert(m.forall(_.getAs[Long]("payload_adler_sum") > 0))
  }

  test("salted join returns exactly the plain join's aggregate") {
    val salted = Joins.qSaltedJoin(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(12,4)")).cast("double").as("sum_qty"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }

  test("two-phase salted distinct matches a direct collect_set") {
    val direct = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(collect_set(col("o_orderpriority")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val salted = Joins.twoPhaseDistinct(
        Tables.orders(spark, sf), col("o_custkey"), col("o_orderpriority"), 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(salted == direct)
  }
}
