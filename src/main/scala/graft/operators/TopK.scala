package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import graft.Tables

/** Top-K-per-group via a bounded-heap typed aggregator.
  *
  * The window-function formulation (row_number over partitionBy/orderBy +
  * filter) sorts EVERY group's full row set; this aggregator keeps a K-sized
  * heap per group, so memory is O(K) per group and the input is consumed in
  * one pass with map-side partial aggregation — at 100 TB the difference
  * between sorting billions of rows per key and streaming them through a
  * 3-element heap. Results are proven identical to the window formulation
  * (spec + shared oracle shape).
  */
object TopK {

  case class Entry(value: Double, tiebreak: Long)

  /** Keep the K largest entries (value desc, tiebreak asc on equal values). */
  class TopKAgg(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    private def lt(a: Entry, b: Entry): Boolean =
      a.value < b.value || (a.value == b.value && a.tiebreak > b.tiebreak)

    def zero: List[Entry] = Nil
    def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(buf, e)
    def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(insert)
    def finish(buf: List[Entry]): Seq[Entry] =
      buf.sortBy(e => (-e.value, e.tiebreak))

    /** Sorted-list insert capped at K (K is tiny; list beats heap constant). */
    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      if (buf.lengthCompare(k) >= 0 && lt(e, buf.last)) buf // full, e below worst
      else {
        val (better, worse) = buf.span(x => !lt(x, e))
        val merged = better ::: (e :: worse)
        if (merged.lengthCompare(k) > 0) merged.take(k) else merged
      }
    }

    def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-3 orders per customer — identical output contract to
    * Relational.qWindowRank, different physical shape (no per-group sort). */
  def qTopkGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
    val agg = new TopKAgg(3).toColumn
    ds.groupByKey(_._1)
      .mapValues(r => Entry(r._2, r._3))
      .agg(agg.name("top"))
      .flatMap { case (cust, top) =>
        top.zipWithIndex.map { case (e, i) => (cust, e.tiebreak, e.value, i + 1) }
      }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  def qTopkGroupSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) t WHERE rn <= 3""".stripMargin
}
