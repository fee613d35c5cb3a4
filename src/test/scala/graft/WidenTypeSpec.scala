package graft

import graft.sources.{GraftSql, GraftTable, Lake}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ALTER COLUMN TYPE widening (r16 — the Delta type-widening contract):
  * a KB metadata commit records the widened schema; pre-widen files
  * scan with their epoch's physical type and CAST up in the branch
  * projection (the rename-epoch machinery, strictly simpler); DML works
  * through the new type; time travel below the widening keeps the old
  * shape; narrowing and incompatible changes refuse; compaction
  * migrates files and collapses the scan. */
class WidenTypeSpec extends GraftSpec {

  private def fixture(): (GraftTable, String, String) = {
    val tmp = Files.createTempDirectory("graft_widen_spec").toString
    val name = s"wt_${java.util.UUID.randomUUID().toString.take(8)}"
    GraftSql.sql(spark,
      s"CREATE TABLE $name (k INT, v STRING, r FLOAT, " +
        s"d DECIMAL(10,2)) LOCATION '$tmp/t'")
    GraftSql.sql(spark,
      s"INSERT INTO $name VALUES (1, 'a', 1.5, 10.25), " +
        "(2, 'b', 2.5, 20.50), (3, 'c', 3.5, 30.75)")
    // CREATE TABLE … LOCATION '<dir>' binds a GraftTable at
    // <dir>/ledger + <dir>/gen — the same handle, reconstructed
    (GraftTable(spark, s"$tmp/t/ledger", s"$tmp/t/gen"), name, tmp)
  }

  test("INT->BIGINT: pre-widen files read through the epoch cast with " +
      "values intact; post-widen DML stores beyond INT range; time " +
      "travel below the widening keeps the old shape") {
    val (tbl, name, _) = fixture()
    val before = tbl.read().select(col("k"), col("v")).collect()
      .map(r => (r.getInt(0).toLong, r.getString(1))).toSet
    val widenSnap = GraftSql.sql(spark,
      s"ALTER TABLE $name ALTER COLUMN k TYPE BIGINT")
      .head().getLong(0)
    // logical type moved, values identical (old files, epoch up-cast)
    val sch = tbl.read().schema
    assert(sch("k").dataType == org.apache.spark.sql.types.LongType, sch)
    val after = tbl.read().select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "pre-widen file values diverged")
    // a value beyond INT range lands through the new type
    GraftSql.sql(spark, s"INSERT INTO $name VALUES (3000000000, 'big', " +
      "9.5, 99.99)")
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM $name WHERE k > 2147483647")
      .head().getLong(0) == 1L)
    // filter over the mixed-epoch relation answers across both branches
    assert(tbl.read().filter(col("k") >= 2).count() == 3L)
    // UPDATE through the widened column (COW rewrite of an OLD file)
    GraftSql.sql(spark, s"UPDATE $name SET v = 'mod' WHERE k = 2")
    assert(tbl.read().filter(col("v") === "mod").count() == 1L)
    assert(tbl.read().count() == 4L)
    // time travel BELOW the widening sees the old physical shape
    val at = Lake.readAt(spark, tbl.ledgerDir, widenSnap - 1)
    assert(at.schema("k").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(at.count() == 3L)
    GraftSql.unbind(spark, name)
  }

  test("FLOAT->DOUBLE and DECIMAL precision growth widen; values intact") {
    val (tbl, name, _) = fixture()
    GraftSql.sql(spark, s"ALTER TABLE $name ALTER COLUMN r TYPE DOUBLE")
    GraftSql.sql(spark,
      s"ALTER TABLE $name ALTER COLUMN d TYPE DECIMAL(18,4)")
    val sch = tbl.read().schema
    assert(sch("r").dataType == org.apache.spark.sql.types.DoubleType)
    assert(sch("d").dataType ==
      org.apache.spark.sql.types.DecimalType(18, 4))
    val got = tbl.read().orderBy(col("k"))
      .select(col("r"), col("d").cast("string")).collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    assert(got.map(_._1).toSeq == Seq(1.5, 2.5, 3.5), got.toSeq)
    assert(got.map(_._2).toSeq ==
      Seq("10.2500", "20.5000", "30.7500"), got.toSeq)
    GraftSql.unbind(spark, name)
  }

  test("refusal matrix: narrowing, incompatible, unknown, same-type, " +
      "constraint-pinned, DEFAULT-pinned") {
    val (tbl, name, tmp) = fixture()
    GraftSql.sql(spark, s"ALTER TABLE $name ALTER COLUMN k TYPE BIGINT")
    intercept[Exception] { tbl.alterColumnType("k", "INT") }     // narrow
    intercept[Exception] { tbl.alterColumnType("v", "INT") }     // incompat
    intercept[Exception] { tbl.alterColumnType("r", "FLOAT") }   // same
    intercept[Exception] { tbl.alterColumnType("nope", "BIGINT") }
    intercept[Exception] { tbl.alterColumnType("d", "DECIMAL(9,2)") }
    intercept[Exception] { tbl.alterColumnType("d", "DECIMAL(12,1)") }
    // LONG->DOUBLE is lossy — refused
    intercept[Exception] { tbl.alterColumnType("k", "DOUBLE") }
    // a CHECK constraint pins its columns (the rename discipline)
    tbl.addConstraint("r_ok", "r >= 0")
    val e = intercept[Exception] { tbl.alterColumnType("r", "DOUBLE") }
    assert(e.getMessage.contains("r_ok"), e.getMessage)
    // DEFAULT-bearing column refuses
    GraftSql.sql(spark,
      s"CREATE TABLE ${name}_def (a INT DEFAULT 7, b STRING) " +
        s"LOCATION '$tmp/def'")
    val e2 = intercept[Exception] {
      GraftSql.sql(spark,
        s"ALTER TABLE ${name}_def ALTER COLUMN a TYPE BIGINT") }
    assert(e2.getMessage.toLowerCase.contains("default"), e2.getMessage)
    GraftSql.unbind(spark, name)
    GraftSql.unbind(spark, s"${name}_def")
  }

  test("restore across the widening boundary serves the old type at " +
      "the new head") {
    val (tbl, name, _) = fixture()
    val preSnap = tbl.snapshot
    GraftSql.sql(spark, s"ALTER TABLE $name ALTER COLUMN k TYPE BIGINT")
    GraftSql.sql(spark,
      s"INSERT INTO $name VALUES (3000000000, 'big', 9.5, 99.99)")
    assert(tbl.restore(preSnap) > 0)
    val head = tbl.read()
    assert(head.schema("k").dataType ==
      org.apache.spark.sql.types.IntegerType,
      head.schema.simpleString)
    assert(head.count() == 3L)
    GraftSql.unbind(spark, name)
  }

  test("compaction migrates pre-widen files to the new physical type " +
      "and the scan collapses to one branch") {
    val (tbl, name, _) = fixture()
    GraftSql.sql(spark, s"ALTER TABLE $name ALTER COLUMN k TYPE BIGINT")
    // a post-widen file alongside the pre-widen one: two epochs live
    GraftSql.sql(spark,
      s"INSERT INTO $name VALUES (3000000000, 'big', 9.5, 99.99)")
    val before = tbl.read().agg(sum(col("k"))).head().getLong(0)
    assert(tbl.compact(200000L) > 0)
    assert(tbl.read().agg(sum(col("k"))).head().getLong(0) == before)
    val plan = tbl.read().queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan.take(800))
    GraftSql.unbind(spark, name)
  }

  test("branch and publish carry the widen log: a widening staged ON a " +
      "branch publishes; main reads pre-fork INT files cast up") {
    val (tbl, name, tmp) = fixture()
    Lake.branch(spark, tbl.ledgerDir, s"$tmp/br")
    val br = GraftTable(spark, s"$tmp/br", s"$tmp/br_gen")
    br.alterColumnType("k", "BIGINT")
    assert(br.read().schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    Lake.publish(spark, s"$tmp/br")
    val out = tbl.read()
    assert(out.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.select(col("k")).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L), "published widening lost pre-fork values")
    GraftSql.unbind(spark, name)
  }

  test("change feed spans widening AND rename boundaries: pre-boundary " +
      "change files align to the current shape (id-resolved names, " +
      "up-cast types) instead of failing or splitting columns") {
    val sess = spark; import sess.implicits._
    val tmp = Files.createTempDirectory("graft_widen_cdc").toString
    val t = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .select(col("k").cast("int").as("k"), col("v"))
      .write.parquet(s"$tmp/landing")
    t.ingest(s"$tmp/landing")
    t.merge(Seq((4, "d")).toDF("k", "v")
      .select(col("k").cast("int").as("k"), col("v")),
      "k", changeFeed = true)
    t.alterColumnType("k", "BIGINT")
    t.renameColumn("v", "label")
    t.merge(Seq((3000000000L, "big")).toDF("k", "label"),
      "k", changeFeed = true)
    val ch = Lake.readChanges(spark, t.ledgerDir, 0L)
    assert(ch.schema("k").dataType == org.apache.spark.sql.types.LongType,
      ch.schema.simpleString)
    assert(ch.schema.fieldNames.contains("label")
      && !ch.schema.fieldNames.contains("v"), ch.schema.simpleString)
    val inserts = ch.filter(col("_change_type") === "insert")
      .select(col("k"), col("label")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(inserts == Set((4L, "d"), (3000000000L, "big")),
      s"pre-boundary change rows misaligned: $inserts")
    // the incremental consumer contract holds across the boundary
    val zero = t.read().limit(0).select(col("k"), col("label"))
    val mirror = Lake.applyChanges(zero, ch, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mirror == Set((4L, "d"), (3000000000L, "big")), mirror.toString)
  }

  test("widen composes with rename: rename then widen the same field; " +
      "old files resolve by id AND cast up") {
    val (tbl, name, _) = fixture()
    GraftSql.sql(spark, s"ALTER TABLE $name RENAME COLUMN k TO key_id")
    GraftSql.sql(spark,
      s"ALTER TABLE $name ALTER COLUMN key_id TYPE BIGINT")
    val out = tbl.read()
    assert(out.schema("key_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.select(col("key_id")).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L), "rename+widen composition lost values")
    // DESCRIBE shows the trail and the new type
    val desc = GraftSql.sql(spark, s"DESCRIBE $name").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(4))).toMap
    assert(desc("key_id") == ("bigint", "k"), desc)
    GraftSql.unbind(spark, name)
  }
}
