package graft

import graft.operators.Pii
import org.apache.spark.sql.functions._

/** PII detect/redact over the committed fixture: the counts must agree
  * with an independent driver-side Java-regex recount, and the redacted
  * text must be CLEAN — re-scanning it for any of the three patterns
  * finds nothing (the property a scrubbing pass actually owes you). */
class PiiSpec extends GraftSpec {

  test("fixture carries all three PII kinds and counts match a driver recount") {
    val rows = Pii.qDocPii(spark, sf).collect()
    assert(rows.length == 400)
    val byKind = (rows.map(_.getAs[Long]("n_email")).sum,
      rows.map(_.getAs[Long]("n_phone")).sum,
      rows.map(_.getAs[Long]("n_ip")).sum)
    assert(byKind._1 > 0 && byKind._2 > 0 && byKind._3 > 0,
      s"fixture must exercise every pattern, got $byKind")

    // independent recount on the driver with java.util.regex directly
    val texts = Pii.docs(spark).collect()
      .map(r => r.getAs[Int]("doc_id") -> r.getAs[String]("text")).toMap
    val counted = rows.map { r =>
      val t = texts(r.getAs[Int]("doc_id"))
      def n(p: String) = {
        val m = java.util.regex.Pattern.compile(p).matcher(t)
        var c = 0; while (m.find()) c += 1; c
      }
      (n(Pii.Email) == r.getAs[Long]("n_email")) &&
        (n(Pii.Phone) == r.getAs[Long]("n_phone")) &&
        (n(Pii.Ip) == r.getAs[Long]("n_ip"))
    }
    assert(counted.forall(identity), "engine counts diverge from driver recount")
  }

  test("redacted text is clean: re-scanning finds zero PII") {
    val leftover = Pii.docs(spark)
      .select(Pii.redact(col("text")).as("red"))
      .select((regexp_count(col("red"), lit(Pii.Email))
        + regexp_count(col("red"), lit(Pii.Phone))
        + regexp_count(col("red"), lit(Pii.Ip))).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(leftover == 0L, s"redaction left $leftover PII matches behind")
  }
}
