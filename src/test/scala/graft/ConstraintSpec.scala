package graft

import graft.sources.{Expectations, GraftTable, Lake}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CHECK constraints (Lake.addConstraint / enforceConstraints): the
  * table's standing hard contract — violating writers abort atomically
  * on every row-writing path (COW merge, MOR merge, gated append),
  * adding a constraint current data violates is refused, NULL violates,
  * drop lifts the gate. */
class ConstraintSpec extends GraftSpec {

  private def fixture(): (GraftTable, String) = {
    val t = Files.createTempDirectory("graft_constraint_spec").toString
    val tbl = GraftTable(spark, s"$t/ledger", s"$t/gen")
    spark.read.parquet(s"$sf/customer.parquet")
      .repartition(4).write.parquet(s"$t/landing")
    tbl.ingest(s"$t/landing")
    (tbl, t)
  }

  test("every row-writing path aborts atomically on violation; clean " +
      "writes land; lifecycle of add/refuse/drop") {
    val (t, _) = fixture()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    // a constraint the data already violates is refused and not persisted
    val refused = intercept[Lake.ConstraintViolationException] {
      t.addConstraint("bal_positive", "c_acctbal >= 0")
    }
    assert(refused.violations > 0 && t.constraints().isEmpty)
    // a typo fails at ADD time, not at the next merge
    intercept[Exception] { t.addConstraint("typo", "c_acctbal >>>= 0") }
    // a holding constraint binds
    t.addConstraint("bal_sane", "c_acctbal > -1000000")
    t.addConstraint("key_present", "c_custkey IS NOT NULL")
    assert(t.constraints().map(_._1) == Seq("bal_sane", "key_present"))
    val head = t.snapshot
    val state = t.read().select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet

    val bad = cust.limit(20).withColumn("c_acctbal", lit(-2e6))
    intercept[Lake.ConstraintViolationException] { t.merge(bad, "c_custkey") }
    intercept[Lake.ConstraintViolationException] { t.mergeMor(bad, "c_custkey") }
    intercept[Lake.ConstraintViolationException] {
      t.appendExpect(bad, Seq(Expectations.Expectation("always", lit(true))))
    }
    // NULL violates (a CHECK must prove itself)
    intercept[Lake.ConstraintViolationException] {
      t.merge(cust.limit(5)
        .withColumn("c_custkey", lit(null).cast("long")), "c_custkey")
    }
    // atomicity: nothing landed, nothing reserved, table bit-unchanged
    assert(t.snapshot == head)
    assert(t.orphans().isEmpty)
    assert(t.read().select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == state)

    // clean writes pass on all three paths
    assert(t.merge(cust.limit(5)
      .withColumn("c_acctbal", col("c_acctbal") + 1), "c_custkey") == head + 1)
    assert(t.mergeMor(cust.limit(5)
      .withColumn("c_acctbal", col("c_acctbal") + 2), "c_custkey") == head + 2)
    val rep = t.appendExpect(
      cust.limit(5).withColumn("c_custkey", col("c_custkey") + 9000000),
      Seq(Expectations.Expectation("always", lit(true))))
    assert(rep.passed == 5)
    // drop lifts the gate
    t.dropConstraint("bal_sane")
    t.dropConstraint("key_present")
    assert(t.constraints().isEmpty)
    val s2 = t.merge(bad, "c_custkey")
    assert(s2 > head + 2)
  }

  test("plain file ingest — the primary landing path — enforces the " +
      "table's constraints; a quarantined violator does not abort the " +
      "gated append") {
    val (t, tmp) = fixture()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    t.addConstraint("bal_sane", "c_acctbal > -1000000")
    val head = t.snapshot
    val state = t.read().count()
    // a landing batch violating the contract never enters the ledger
    cust.limit(10).withColumn("c_acctbal", lit(-2e6))
      .write.parquet(s"$tmp/landing_bad")
    intercept[Lake.ConstraintViolationException] { t.ingest(s"$tmp/landing_bad") }
    assert(t.snapshot == head && t.read().count() == state)
    // a clean batch still lands through the same path
    cust.limit(10).withColumn("c_custkey", col("c_custkey") + 8000000)
      .write.parquet(s"$tmp/landing_ok")
    assert(t.ingest(s"$tmp/landing_ok") >= 1) // files ingested
    assert(t.snapshot == head + 1)
    // constraints bind only rows that LAND: a violating row an
    // expectation quarantines never reaches the table, so it must not
    // block the valid rows' append
    val mixed = cust.limit(10)
      .withColumn("c_custkey", col("c_custkey") + 8100000)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 2 === 0, lit(-2e6)).otherwise(col("c_acctbal")))
    val rep = t.appendExpect(mixed,
      Seq(Expectations.Expectation("bal_ok", col("c_acctbal") > -1000000)))
    assert(rep.passed + rep.quarantined == 10 && rep.quarantined > 0,
      s"expected a mixed split, got $rep")
    // but an UNQUARANTINED violator still aborts atomically pre-write
    val gens = Option(new java.io.File(s"$tmp/gen").listFiles())
      .getOrElse(Array()).length
    intercept[Lake.ConstraintViolationException] {
      t.appendExpect(cust.limit(5).withColumn("c_acctbal", lit(-2e6)),
        Seq(Expectations.Expectation("always", lit(true))))
    }
    assert(Option(new java.io.File(s"$tmp/gen").listFiles())
      .getOrElse(Array()).length == gens,
      "aborted gated append left generation debris")
  }

  test("branches inherit the table's constraints — a WAP write faces " +
      "exactly main's gates") {
    val (t, tmp) = fixture()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    t.addConstraint("bal_sane", "c_acctbal > -1000000")
    val branchDir = s"$tmp/branch"
    t.branch(branchDir)
    assert(Lake.constraints(branchDir) == t.constraints())
    // the violating write fails ON THE BRANCH, before any audit/publish
    intercept[Lake.ConstraintViolationException] {
      Lake.mergeInto(spark, branchDir, s"$tmp/bgen",
        cust.limit(5).withColumn("c_acctbal", lit(-2e6)), "c_custkey")
    }
    // a clean branch write + publish carries through
    Lake.mergeInto(spark, branchDir, s"$tmp/bgen",
      cust.limit(5).withColumn("c_acctbal", col("c_acctbal") + 1),
      "c_custkey")
    assert(Lake.publish(spark, branchDir).nonEmpty)
  }
}