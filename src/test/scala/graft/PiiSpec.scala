package graft

import graft.operators.Pii
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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

    // independent recount on the driver with java.util.regex directly,
    // mirroring scrub's semantics: each count runs on the text after the
    // previous pattern's redaction
    val texts = Pii.docs(spark).collect()
      .map(r => r.getAs[Int]("doc_id") -> r.getAs[String]("text")).toMap
    def n(t: String, p: String) = {
      val m = java.util.regex.Pattern.compile(p).matcher(t)
      var c = 0; while (m.find()) c += 1; c
    }
    val counted = rows.map { r =>
      val t = texts(r.getAs[Int]("doc_id"))
      val r1 = t.replaceAll(Pii.Email, "<EMAIL>")
      val r2 = r1.replaceAll(Pii.Phone, "<PHONE>")
      (n(t, Pii.Email) == r.getAs[Long]("n_email")) &&
        (n(r1, Pii.Phone) == r.getAs[Long]("n_phone")) &&
        (n(r2, Pii.Ip) == r.getAs[Long]("n_ip"))
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

  test("streaming scrub equals the batch scrub over all landed lines") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val lines = Seq(
      "7|ping oncall at user3@example1.org about the ramp",
      "8|clean shift nothing tripped",
      "no separator here: must drop",
      "9|escalate to +1-555-201-3344 or 10.1.2.3 over night")
    val (first, second) = lines.splitAt(2)

    val mem = MemoryStream[String]
    val query = Streams.piiScrub(mem.toDF()).writeStream
      .format("memory").queryName("pii_scrub_out")
      .outputMode("append").start()
    try {
      mem.addData(first)
      query.processAllAvailable()
      assert(spark.table("pii_scrub_out").count() == 2)
      mem.addData(second)
      query.processAllAvailable()
      val streamed = spark.table("pii_scrub_out").collect()
        .map(r => (r.getAs[Int]("doc_id"),
          (r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
            r.getAs[Long]("n_ip"), r.getAs[String]("redacted")))).toMap
      val batch = Pii.scrub(Pii.parseDocs(lines.toDF("value"))).collect()
        .map(r => (r.getAs[Int]("doc_id"),
          (r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
            r.getAs[Long]("n_ip"), r.getAs[String]("redacted")))).toMap
      assert(streamed == batch, "streamed scrub diverges from batch")
      assert(streamed.size == 3, "malformed line must drop")
      assert(streamed(9)._4.contains("<PHONE>") && streamed(9)._4.contains("<IP>"))
      assert(streamed(7)._4.contains("<EMAIL>"))
    } finally query.stop()
  }
}
