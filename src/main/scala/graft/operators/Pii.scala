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
    * counts and the redacted text itself (what a sink would store). */
  def scrub(parsed: DataFrame): DataFrame =
    parsed.select(col("doc_id"),
      regexp_count(col("text"), lit(Email)).cast("long").as("n_email"),
      regexp_count(col("text"), lit(Phone)).cast("long").as("n_phone"),
      regexp_count(col("text"), lit(Ip)).cast("long").as("n_ip"),
      redact(col("text")).as("redacted"))

  /** Redaction order is email → phone → IP; the three patterns are
    * mutually non-overlapping (no dotted-quad can sit inside an email the
    * generator emits, phones are dash-separated), so the counts on the
    * ORIGINAL text and the sequential replaces agree. */
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

  def qDocPiiSql: String = {
    val abs = Configs.absDir(PiiPath)
    s"""WITH raw AS (
       |  SELECT unnest(string_split(content, chr(10))) AS line
       |  FROM read_text('$abs')
       |),
       |d AS (
       |  SELECT CAST(string_split(line, '|')[1] AS INT) AS doc_id,
       |         string_split(line, '|')[2] AS text
       |  FROM raw WHERE line <> ''
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '${Email}')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(text, '${Phone}')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(text, '${Ip}')) AS BIGINT) AS n_ip,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '${Email}', '<EMAIL>', 'g'),
       |    '${Phone}', '<PHONE>', 'g'),
       |    '${Ip}', '<IP>', 'g')) AS redacted_md5
       |FROM d""".stripMargin
  }
}
