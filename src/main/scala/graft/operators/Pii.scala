package graft.operators

import graft.sources.Configs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before any other stage may look at raw text: find
  * emails / phone numbers / IPv4 addresses, count them per document, and
  * replace them with typed placeholders.
  *
  * Scale shape: a pure NARROW transform — regex count + chained
  * `regexp_replace`, all codegen'd native expressions, one row in / one
  * row out, ZERO shuffles at any corpus size; 100 TB of text is a
  * scan-bound single pass that parallelizes by file block. The output
  * carries `md5(redacted)` rather than the redacted text so the
  * correctness gate hash-compares the ACTUAL redaction result across
  * engines, not just the counts. Regexes are lookahead-free and
  * backreference-free (identical semantics on Java regex and DuckDB's
  * RE2 — the CLAUDE.md oracle discipline); DuckDB's `regexp_replace`
  * needs the explicit `'g'` flag to match Spark's replace-all default. */
object Pii {

  /** Committed fixture (see `graft.tools.PiiGen`). */
  val PiiPath = "data/pii/corpus.txt"

  /** user99@example9.org — local part then a dotted domain. */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** +1-555-123-4567 — international prefix, dash-separated groups. */
  val Phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4, word-bounded so it never eats into longer runs. */
  val Ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** `doc_id|text` lines → (doc_id, text); non-conforming lines (no
    * separator, junk id) drop as data, never as exceptions — shared
    * verbatim by the batch query and the streaming scrubber
    * (`Streams.piiScrub`): a pure narrow transform, so Structured
    * Streaming incrementalizes the SAME plan. */
  def parseDocs(raw: DataFrame): DataFrame =
    raw
      .select(split(col("value"), "\\|", 2).as("p"))
      // try_cast + get(), not cast/[1]: ANSI mode throws on a junk id or a
      // missing separator, and a malformed line must drop as data, never
      // kill the stream
      .select(expr("try_cast(p[0] AS INT)").as("doc_id"),
        get(col("p"), lit(1)).as("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)

  /** The fixture corpus as (doc_id, text). */
  def docs(s: SparkSession): DataFrame =
    parseDocs(s.read.text(Configs.absDir(PiiPath)))

  /** Detection + redaction over a parsed (doc_id, text) frame: per-doc
    * counts and the redacted text itself (what a sink would store). Each
    * count is taken on the text AFTER the previous pattern's redaction —
    * so the counts are exactly what the chained redaction replaced, even
    * on adversarial input where an email swallows a phone-shaped
    * substring (counts on the raw text would claim a phone the redaction
    * never touched). */
  def scrub(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("r1", regexp_replace(col("text"), Email, "<EMAIL>"))
      .withColumn("r2", regexp_replace(col("r1"), Phone, "<PHONE>"))
      .select(col("doc_id"),
        regexp_count(col("text"), lit(Email)).cast("long").as("n_email"),
        regexp_count(col("r1"), lit(Phone)).cast("long").as("n_phone"),
        regexp_count(col("r2"), lit(Ip)).cast("long").as("n_ip"),
        regexp_replace(col("r2"), Ip, "<IP>").as("redacted"))

  /** Redaction-only form (no counts), chained email → phone → IP exactly
    * like `scrub`'s r1/r2 intermediates — the redacted output is
    * IDENTICAL to scrub's on any input. (Only scrub's per-pattern counts
    * carry the post-redaction subtlety: on adversarial text an email can
    * swallow a phone-shaped substring, which is why scrub counts on the
    * previously-redacted intermediate, not the original.) */
  def redact(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, Email, "<EMAIL>"),
        Phone, "<PHONE>"),
      Ip, "<IP>")

  def qDocPii(s: SparkSession, d: String): DataFrame =
    scrub(docs(s))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        md5(col("redacted")).as("redacted_md5"))

  /** The oracle mirrors parseDocs EXACTLY: text is everything after the
    * FIRST separator (a '|' inside the text must survive, as Spark's
    * split-limit-2 keeps it), the id parse is a TRY_CAST (a junk id drops
    * the row, never errors), and each count runs on the
    * previously-redacted text like `scrub` does. */
  def qDocPiiSql: String = {
    val abs = Configs.absDir(PiiPath)
    s"""WITH raw AS (
       |  SELECT unnest(string_split(content, chr(10))) AS line
       |  FROM read_text('$abs')
       |),
       |d AS (
       |  SELECT TRY_CAST(substr(line, 1, strpos(line, '|') - 1) AS INT) AS doc_id,
       |         substr(line, strpos(line, '|') + 1) AS text
       |  FROM raw
       |  WHERE strpos(line, '|') > 0
       |    AND TRY_CAST(substr(line, 1, strpos(line, '|') - 1) AS INT) IS NOT NULL
       |),
       |r AS (
       |  SELECT doc_id, text,
       |         regexp_replace(text, '${Email}', '<EMAIL>', 'g') AS r1
       |  FROM d
       |),
       |r2 AS (
       |  SELECT doc_id, text, r1,
       |         regexp_replace(r1, '${Phone}', '<PHONE>', 'g') AS r2
       |  FROM r
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '${Email}')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(r1, '${Phone}')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(r2, '${Ip}')) AS BIGINT) AS n_ip,
       |  md5(regexp_replace(r2, '${Ip}', '<IP>', 'g')) AS redacted_md5
       |FROM r2""".stripMargin
  }
}
