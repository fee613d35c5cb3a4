package graft

import graft.sources.{GraftSql, GraftTable, Lake}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ALTER TABLE RENAME COLUMN via column-mapping field ids (r15):
  * pre-rename files keep serving the column under its new logical name
  * (the rename-epoch scan resolves each file's physical name by field
  * id through the schema recording current at the file's winning-add
  * snapshot), DML works through the new name, the OLD name becomes
  * legally re-addable (the id disambiguates — the exact hazard column
  * mapping exists to solve), time travel below the rename sees the old
  * shape, and DESCRIBE surfaces the id + rename trail. */
class RenameColumnSpec extends GraftSpec {

  private def fixture(): (GraftTable, String) = {
    val tmp = Files.createTempDirectory("graft_rename_spec").toString
    val tbl = GraftTable(spark, s"$tmp/ledger", s"$tmp/gen")
    spark.read.parquet(s"$sf/customer.parquet")
      .repartition(4).write.parquet(s"$tmp/landing")
    tbl.ingest(s"$tmp/landing")
    (tbl, tmp)
  }

  test("rename: pre-rename files read through the new name; values " +
      "byte-identical; DML through the new name; time travel below " +
      "sees the old shape") {
    val (tbl, _) = fixture()
    val before = tbl.read().select(col("c_custkey"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val renameSnap = tbl.renameColumn("c_acctbal", "balance")
    // logical schema moved, values identical (old files, new name)
    val cols = tbl.read().schema.fieldNames.toSeq
    assert(cols.contains("balance") && !cols.contains("c_acctbal"), cols)
    val after = tbl.read().select(col("c_custkey"), col("balance"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(after == before, "pre-rename file values diverged")
    // filter pushdown through the rename epoch still answers correctly
    val nPos = tbl.read().filter(col("balance") > 0).count()
    assert(nPos == before.values.count(_ > 0).toLong)
    // DML through the NEW name (post-image lands in new-name files)
    tbl.update(col("balance") < 0, Seq("balance" -> lit(0.0)))
    assert(tbl.read().filter(col("balance") < 0).count() == 0L)
    val untouched = tbl.read().filter(col("balance") > 0)
      .select(col("c_custkey"), col("balance"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(untouched == before.filter(_._2 > 0),
      "rows the update did not touch must keep pre-rename values")
    // mixed-epoch read: updated files carry the new physical name, the
    // rest keep the old one — one logical relation either way
    assert(tbl.read().count() == before.size.toLong)
    // time travel BELOW the rename sees the old shape and old values
    val at = Lake.readAt(spark, tbl.ledgerDir, renameSnap - 1)
    assert(at.schema.fieldNames.contains("c_acctbal"))
    val tt = at.select(col("c_custkey"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(tt == before)
  }

  test("rename: the old name is legally re-addable; the id keeps old " +
      "files' data out of the new column; DESCRIBE shows the mapping") {
    val (tbl, _) = fixture()
    tbl.bindSql("ren_t")
    GraftSql.sql(spark,
      "ALTER TABLE ren_t RENAME COLUMN c_mktsegment TO segment")
    // re-adding the renamed-away NAME is legal now (fresh field id)
    GraftSql.sql(spark, "ALTER TABLE ren_t ADD COLUMN c_mktsegment STRING")
    val got = GraftSql.sql(spark,
      "SELECT segment, c_mktsegment FROM ren_t").collect()
    // the renamed column still serves the old files' values; the
    // re-added column must be NULL everywhere (never the old data)
    assert(got.forall(r => !r.isNullAt(0)), "renamed column lost values")
    assert(got.forall(_.isNullAt(1)),
      "re-added old name resurfaced pre-rename data")
    // a write into the re-added column lands and stays disjoint
    GraftSql.sql(spark,
      "UPDATE ren_t SET c_mktsegment = 'NEW' WHERE c_custkey % 100 = 0")
    val n = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM ren_t WHERE c_mktsegment = 'NEW'")
      .head().getLong(0)
    assert(n > 0)
    // DESCRIBE: field ids everywhere; the renamed column shows its trail
    val desc = GraftSql.sql(spark, "DESCRIBE ren_t").collect()
      .map(r => r.getString(0) -> (r.getString(3), r.getString(4))).toMap
    assert(desc("segment")._1 != null && desc("segment")._2 == "c_mktsegment")
    assert(desc("c_mktsegment")._1 != null
      && desc("c_mktsegment")._1 != desc("segment")._1,
      s"re-added column must carry a FRESH id: $desc")
    assert(desc("c_custkey")._2 == null)
    GraftSql.unbind(spark, "ren_t")
  }

  test("rename chain + rename after evolution: two renames of the same " +
      "field resolve per epoch; a column added between renames reads " +
      "null only below its birth") {
    val (tbl, _) = fixture()
    val n0 = tbl.read().count()
    tbl.renameColumn("c_name", "customer_name")
    tbl.addColumns("note STRING")
    // post-evolution write: new files carry (customer_name, note)
    tbl.update(col("c_custkey") % 10 === 3, Seq("note" -> lit("mod10=3")))
    tbl.renameColumn("customer_name", "cname")
    val out = tbl.read()
    assert(out.count() == n0)
    // the twice-renamed column serves every epoch's files
    assert(out.filter(col("cname").isNull).count() == 0L)
    // note: only the updated rows carry it (old files null-fill)
    assert(out.filter(col("note") === "mod10=3").count()
      == out.filter(col("c_custkey") % 10 === 3).count())
    assert(out.filter(col("note").isNotNull
      && col("c_custkey") % 10 =!= 3).count() == 0L)
    // DESCRIBE trail shows both former names, oldest first
    tbl.bindSql("ren_chain")
    val trail = GraftSql.sql(spark, "DESCRIBE ren_chain").collect()
      .find(_.getString(0) == "cname").get.getString(4)
    assert(trail == "c_name -> customer_name", trail)
    GraftSql.unbind(spark, "ren_chain")
  }

  test("rename refusals: unknown column, clashing target, constraint-" +
      "referenced column, DEFAULT-bearing column, generated input") {
    val (tbl, tmp) = fixture()
    intercept[Exception] { tbl.renameColumn("nope", "x") }
    intercept[Exception] { tbl.renameColumn("c_name", "c_acctbal") }
    tbl.addConstraint("bal_ok", "c_acctbal >= -10000")
    val e = intercept[Exception] { tbl.renameColumn("c_acctbal", "bal") }
    assert(e.getMessage.contains("bal_ok"), e.getMessage)
    // a generated column's input is pinned by its auto-constraint
    GraftSql.sql(spark,
      s"""CREATE TABLE ren_gen (a BIGINT, b BIGINT GENERATED ALWAYS AS
         | (a * 2)) LOCATION '$tmp/gen_t'""".stripMargin)
    val e2 = intercept[Exception] {
      GraftSql.sql(spark, "ALTER TABLE ren_gen RENAME COLUMN a TO a2") }
    assert(e2.getMessage.contains("gen_b"), e2.getMessage)
    GraftSql.unbind(spark, "ren_gen")
    // DEFAULT-bearing column refuses (the default is keyed by name)
    GraftSql.sql(spark,
      s"CREATE TABLE ren_def (a BIGINT, s STRING DEFAULT 'x') " +
        s"LOCATION '$tmp/def_t'")
    val e3 = intercept[Exception] {
      GraftSql.sql(spark, "ALTER TABLE ren_def RENAME COLUMN s TO s2") }
    assert(e3.getMessage.toLowerCase.contains("default"), e3.getMessage)
    GraftSql.unbind(spark, "ren_def")
  }

  test("rename survives restore across the rename boundary: restoring " +
      "below the rename serves the old shape at the new head") {
    val (tbl, _) = fixture()
    val preSnap = tbl.snapshot
    tbl.renameColumn("c_acctbal", "balance")
    tbl.update(col("balance") < 0, Seq("balance" -> lit(0.0)))
    val restored = tbl.restore(preSnap)
    assert(restored > 0)
    val head = tbl.read()
    assert(head.schema.fieldNames.contains("c_acctbal"),
      head.schema.fieldNames.mkString(","))
    // the restored state must equal the pre-rename content exactly
    assert(head.filter(col("c_acctbal") < 0).count() > 0,
      "restore must roll the update back")
    assert(head.count() == Lake.readAt(spark, tbl.ledgerDir, preSnap).count())
  }

  test("MOR deletion vectors compose with renames: a DV recorded BEFORE " +
      "the rename stays applied; a MOR delete THROUGH the new name works") {
    val (tbl, _) = fixture()
    val n0 = tbl.read().count()
    val negs = tbl.read().filter(col("c_acctbal") < 0).count()
    tbl.deleteMor(col("c_acctbal") < 0)
    assert(tbl.read().count() == n0 - negs)
    tbl.renameColumn("c_acctbal", "balance")
    // the pre-rename vector still applies through the epoch scan
    assert(tbl.read().count() == n0 - negs)
    assert(tbl.read().filter(col("balance") < 0).count() == 0L)
    // a MOR delete addressed through the NEW name (positions must
    // materialize per epoch branch)
    val bigs = tbl.read().filter(col("balance") > 9000).count()
    assert(bigs > 0)
    tbl.deleteMor(col("balance") > 9000)
    assert(tbl.read().count() == n0 - negs - bigs)
    assert(tbl.read().filter(col("balance") > 9000).count() == 0L)
  }

  test("branch and publish carry the rename machinery: a branch of a " +
      "renamed table reads pre-rename files correctly; a rename staged " +
      "ON a branch publishes to main") {
    val (tbl, tmp) = fixture()
    val sumBefore = tbl.read()
      .agg(sum(col("c_acctbal").cast("decimal(18,2)"))).head().getDecimal(0)
    tbl.renameColumn("c_acctbal", "balance")
    // branch AFTER the rename: the branch must resolve old files by id
    Lake.branch(spark, tbl.ledgerDir, s"$tmp/br")
    val br = GraftTable(spark, s"$tmp/br", s"$tmp/br_gen")
    assert(br.read().schema.fieldNames.contains("balance"))
    val sumBranch = br.read()
      .agg(sum(col("balance").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(sumBranch == sumBefore, "branch lost pre-rename values")
    // rename staged ON a fresh head-pinned branch publishes to main
    val (tbl2, tmp2) = fixture()
    Lake.branch(spark, tbl2.ledgerDir, s"$tmp2/br2")
    val br2 = GraftTable(spark, s"$tmp2/br2", s"$tmp2/br2_gen")
    br2.renameColumn("c_name", "customer_name")
    Lake.publish(spark, s"$tmp2/br2")
    assert(tbl2.read().schema.fieldNames.contains("customer_name"))
    assert(tbl2.read().filter(col("customer_name").isNull).count() == 0L,
      "published rename lost the log — main read the wrong physical name")
  }

  test("publish retrofits main's PRE-FORK id-less recordings before the " +
      "rename log lands: a pre-field-id-era table never silently " +
      "null-fills after a branch-staged rename publishes") {
    import org.apache.spark.sql.types._
    val (tbl, tmp) = fixture()
    // simulate a pre-r15 table: strip field ids from main's recordings
    val schemaDir = new java.io.File(s"${tbl.ledgerDir}/_schema")
    val re = """schema-(\d+)\.json""".r
    schemaDir.listFiles().foreach { f =>
      if (re.findFirstIn(f.getName).isDefined) {
        val sch = DataType.fromJson(new String(
          Files.readAllBytes(f.toPath), "UTF-8")).asInstanceOf[StructType]
        val stripped = StructType(
          sch.fields.map(_.copy(metadata = Metadata.empty)))
        Files.write(f.toPath, stripped.json.getBytes("UTF-8"))
      }
    }
    val sumBefore = tbl.read()
      .agg(sum(col("c_acctbal").cast("decimal(18,2)"))).head().getDecimal(0)
    Lake.branch(spark, tbl.ledgerDir, s"$tmp/brp")
    val br = GraftTable(spark, s"$tmp/brp", s"$tmp/brp_gen")
    br.renameColumn("c_acctbal", "balance")
    Lake.publish(spark, s"$tmp/brp")
    // main must read pre-fork files through the new name with VALUES —
    // an id-less epoch recording would null-fill every row (or now
    // refuse loudly); neither may happen after the publish-side retrofit
    val out = tbl.read()
    assert(out.schema.fieldNames.contains("balance"))
    assert(out.filter(col("balance").isNull).count() == 0L,
      "published rename null-filled pre-fork files on main")
    val sumAfter = out.agg(sum(col("balance").cast("decimal(18,2)")))
      .head().getDecimal(0)
    assert(sumAfter == sumBefore, "pre-fork values diverged through publish")
  }

  test("a crashed renameColumn's orphan rename-log entry is swept by the " +
      "next commit: no phantom rename trail, no bogus epoch resolution") {
    val (tbl, tmp) = fixture()
    val next = tbl.snapshot + 1
    // simulate the crash window: rename-N.json written, snapshot never
    // landed (renameColumn stages the log entry before appendSnapshot)
    val renDir = new java.io.File(s"${tbl.ledgerDir}/_renames")
    renDir.mkdirs()
    Files.write(
      java.nio.file.Paths.get(s"${renDir.getPath}/rename-$next.json"),
      (s"""{"snapshot":$next,"id":1,"from":"c_name",""" +
        """"to":"ghost"}""").getBytes("UTF-8"))
    // an unrelated commit lands AT the orphan's id
    tbl.read().limit(10).write.parquet(s"$tmp/landing2")
    tbl.ingest(s"$tmp/landing2")
    assert(tbl.snapshot == next)
    val leftover = Option(renDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("rename-\\d+\\.json"))
    assert(leftover.isEmpty,
      "orphan rename entry survived the commit sweep — phantom rename: " +
        leftover.map(_.getName).mkString(","))
    // the table still reads under its REAL names (no ghost resolution)
    assert(tbl.read().schema.fieldNames.contains("c_name"))
    assert(tbl.read().filter(col("c_name").isNull).count() == 0L)
  }

  test("compaction migrates renamed files to the new physical name and " +
      "the scan collapses back to one branch") {
    val (tbl, _) = fixture()
    val before = tbl.read().agg(sum(col("c_acctbal").cast("decimal(18,2)")))
      .head().getDecimal(0)
    tbl.renameColumn("c_acctbal", "balance")
    assert(tbl.compact(200000L) > 0)
    val after = tbl.read().agg(sum(col("balance").cast("decimal(18,2)")))
      .head().getDecimal(0)
    assert(after == before)
    // post-compaction every live file postdates the rename: the epoch
    // grouping must produce ONE scan branch (no union in the plan)
    val plan = tbl.read().queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan.take(800))
  }
}
