package graft

import graft.sources.{GraftSql, GraftTable, Lake}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** GENERATED ALWAYS AS IDENTITY (the Delta identity contract): system
  * allocation on INSERT — unique, strictly above every prior
  * allocation, gaps allowed; ALWAYS means explicit writes refuse on
  * every path; the allocator's high-water mark survives restarts and
  * fast-forwards through publish. */
class IdentitySpec extends GraftSpec {

  test("identity allocates unique increasing values across inserts; " +
      "START WITH / INCREMENT BY honored; explicit writes refuse on " +
      "every path") {
    val tmp = Files.createTempDirectory("graft_ident").toString
    GraftSql.sql(spark,
      s"CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
        s"v STRING, w STRING) LOCATION '$tmp/t'")
    GraftSql.sql(spark, "INSERT INTO idt (v) VALUES ('a'), ('b'), ('c')")
    val ids1 = GraftSql.sql(spark, "SELECT id FROM idt").collect()
      .map(_.getLong(0)).toSeq
    assert(ids1.length == 3 && ids1.distinct.length == 3, ids1)
    assert(ids1.forall(_ >= 1L), ids1)
    val max1 = ids1.max
    // the second batch allocates strictly above the first
    GraftSql.sql(spark, "INSERT INTO idt (v) VALUES ('d'), ('e')")
    val ids2 = GraftSql.sql(spark, "SELECT id FROM idt").collect()
      .map(_.getLong(0)).toSeq
    assert(ids2.length == 5 && ids2.distinct.length == 5, ids2)
    assert(ids2.filterNot(ids1.contains).forall(_ > max1),
      s"second batch not above $max1: $ids2")
    // explicit writes refuse: listed, positional, byName-shaped, SET
    val e1 = intercept[Exception] {
      GraftSql.sql(spark, "INSERT INTO idt (id, v) VALUES (7, 'x')") }
    assert(e1.getMessage.contains("IDENTITY"), e1.getMessage)
    val e2 = intercept[Exception] {
      GraftSql.sql(spark, "INSERT INTO idt VALUES (8, 'y', 'w')") }
    assert(e2.getMessage.contains("IDENTITY"), e2.getMessage)
    val e3 = intercept[Exception] {
      GraftSql.sql(spark, "UPDATE idt SET id = 99 WHERE v = 'a'") }
    assert(e3.getMessage.contains("IDENTITY"), e3.getMessage)
    // MERGE refuses loudly (the documented v1 scope)
    val e4 = intercept[Exception] {
      GraftSql.sql(spark,
        """MERGE INTO idt USING (SELECT 'a' AS v) s ON idt.v = s.v
          |WHEN MATCHED THEN UPDATE SET w = 'z'""".stripMargin) }
    assert(e4.getMessage.contains("IDENTITY"), e4.getMessage)
    GraftSql.unbind(spark, "idt")

    // START WITH / INCREMENT BY: ids land on the declared grid
    GraftSql.sql(spark,
      s"CREATE TABLE idt2 (id BIGINT GENERATED ALWAYS AS IDENTITY " +
        s"(START WITH 100 INCREMENT BY 5), v STRING) LOCATION '$tmp/t2'")
    GraftSql.sql(spark, "INSERT INTO idt2 (v) VALUES ('a'), ('b')")
    val g = GraftSql.sql(spark, "SELECT id FROM idt2").collect()
      .map(_.getLong(0)).toSeq
    assert(g.forall(i => i >= 100L && (i - 100L) % 5L == 0L), g)
    assert(g.distinct.length == 2, g)
    GraftSql.unbind(spark, "idt2")
  }

  test("concurrent same-JVM inserts never allocate duplicate ids (the " +
      "allocator lock serializes read-hwm/allocate/append/bump)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val tmp = Files.createTempDirectory("graft_ident_cc").toString
    GraftSql.sql(spark,
      s"CREATE TABLE idcc (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
        s"v STRING) LOCATION '$tmp/t'")
    val fs = (0 until 4).map { w =>
      Future {
        GraftSql.sql(spark, "INSERT INTO idcc (v) VALUES " +
          (0 until 50).map(i => s"('w$w-$i')").mkString(", "))
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    val ids = GraftSql.sql(spark, "SELECT id FROM idcc").collect()
      .map(_.getLong(0))
    assert(ids.length == 200, s"rows: ${ids.length}")
    assert(ids.distinct.length == 200,
      s"duplicate identity values under concurrency: " +
        ids.groupBy(identity).filter(_._2.length > 1).keys.take(5)
          .mkString(","))
    GraftSql.unbind(spark, "idcc")
  }

  test("INT identity refuses at CREATE (the partition-salted allocator " +
      "exceeds Int range); a FAILED append still burns its reserved " +
      "ids — the hwm reserves BEFORE the append commits") {
    val tmp = Files.createTempDirectory("graft_ident_rs").toString
    // BIGINT-only refusal (r16 advisor): monotonically_increasing_id
    // is >= 2^33 in partition 1+, so an INT identity would overflow on
    // any multi-partition insert — the untested path refuses loudly
    val e = intercept[Exception] {
      GraftSql.sql(spark,
        s"CREATE TABLE idint (id INT GENERATED ALWAYS AS IDENTITY, " +
          s"v STRING) LOCATION '$tmp/ti'") }
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
    // reserve-before-append: a CHECK-gate-failed insert must not
    // re-issue its ids to the next insert (crash-window semantics —
    // gaps are allowed, duplicates never)
    GraftSql.sql(spark,
      s"CREATE TABLE idrs (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
        s"v INT) LOCATION '$tmp/t'")
    GraftSql.sql(spark,
      "ALTER TABLE idrs ADD CONSTRAINT pos CHECK (v > 0)")
    intercept[Exception] {
      GraftSql.sql(spark, "INSERT INTO idrs (v) VALUES (-1), (-2)") }
    GraftSql.sql(spark, "INSERT INTO idrs (v) VALUES (1), (2)")
    val ids = GraftSql.sql(spark, "SELECT id FROM idrs").collect()
      .map(_.getLong(0)).toSeq
    assert(ids.length == 2 && ids.distinct.length == 2, ids)
    // the failed attempt reserved at least 2 ids starting at 1 — the
    // landed rows must sit strictly above that burned range
    assert(ids.forall(_ > 2L),
      s"failed append's ids re-issued (expected all > 2): $ids")
    GraftSql.unbind(spark, "idrs")
  }

  test("the allocator hwm fast-forwards through branch + publish: main " +
      "never re-allocates ids the branch handed out") {
    val tmp = Files.createTempDirectory("graft_ident_br").toString
    GraftSql.sql(spark,
      s"CREATE TABLE idbr (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
        s"v STRING) LOCATION '$tmp/t'")
    GraftSql.sql(spark, "INSERT INTO idbr (v) VALUES ('m1'), ('m2')")
    val t = GraftTable(spark, s"$tmp/t/ledger", s"$tmp/t/gen")
    Lake.branch(spark, t.ledgerDir, s"$tmp/br")
    val br = GraftTable(spark, s"$tmp/br", s"$tmp/br_gen")
    br.bindSql("idbr_branch")
    GraftSql.sql(spark,
      "INSERT INTO idbr_branch (v) VALUES ('b1'), ('b2'), ('b3')")
    val brMax = br.read().agg(max(col("id"))).head().getLong(0)
    Lake.publish(spark, s"$tmp/br")
    // main sees the branch's rows AND allocates strictly above them
    GraftSql.sql(spark, "INSERT INTO idbr (v) VALUES ('m3')")
    val all = t.read().select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(all.length == 6 && all.map(_._1).distinct.length == 6,
      all.mkString(","))
    val m3 = all.find(_._2 == "m3").get._1
    assert(m3 > brMax, s"main re-allocated at/below the branch hwm: " +
      s"$m3 <= $brMax")
    GraftSql.unbind(spark, "idbr"); GraftSql.unbind(spark, "idbr_branch")
  }
}
