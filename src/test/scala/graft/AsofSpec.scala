package graft

import graft.operators.{Events, Joins}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Generalized as-of join (Joins.asofJoin): latest at-or-before match per
  * key via ONE union + running-last window (both sides shuffle once on
  * the keys — no range explosion), left-outer `matched` struct,
  * equal-timestamp ties match, tolerance nulls stale matches.
  */
class AsofSpec extends GraftSpec {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("hand-built cases: match, equal-ts tie, no-predecessor null, " +
      "tolerance nulling, key isolation") {
    val sess = spark
    import sess.implicits._
    val quotes = Seq( // (sym, q_ts, px)
      ("A", ts(100), 1.0), ("A", ts(200), 2.0), ("A", ts(300), 3.0),
      ("B", ts(150), 9.0)
    ).toDF("sym", "q_ts", "px")
    val trades = Seq( // (sym, t_ts, qty)
      ("A", ts(250), 10L), // -> px 2.0 (latest at-or-before)
      ("A", ts(200), 11L), // equal ts -> px 2.0 (at-or-before includes ==)
      ("A", ts(50), 12L),  // nothing precedes -> null
      ("B", ts(400), 13L), // B's own quote, never A's -> 9.0
      ("C", ts(500), 14L)  // keyless -> null
    ).toDF("sym", "t_ts", "qty")
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .select(col("qty"), col("matched.px").as("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(10L) == 2.0 && out(11L) == 2.0 && out(13L) == 9.0)
    assert(out(12L) == null && out(14L) == null)
    // tolerance: 60s window nulls the 250->200 match? no (50s fresh);
    // nulls B's 400->150 (250s stale)
    val tol = Joins.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        tolerance = Some(expr("INTERVAL 60 SECONDS")))
      .select(col("qty"), col("matched.px").as("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(tol(10L) == 2.0 && tol(11L) == 2.0)
    assert(tol(13L) == null, "stale match must null under tolerance")
  }

  test("events equivalence: asofJoin equals the brute-force " +
      "latest-at-or-before on real data") {
    val ev = Events.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    val brute = purchases.map { case (eid, uid, t) =>
      val prior = views.filter(v => v._1 == uid && !v._2.after(t))
      eid -> (if (prior.isEmpty) null else prior.map(_._2).max)
    }.toMap
    val got = Joins.qEvtAsofJoin(spark, sf)
      .select(col("event_id"), col("view_ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    // inner form: exactly the purchases with a predecessor
    assert(got.keySet == brute.filter(_._2 != null).keySet)
    got.foreach { case (eid, vts) => assert(vts == brute(eid), s"purchase $eid") }
    assert(got.nonEmpty && brute.values.exists(_ == null),
      "fixture must exercise both matched and unmatched")
  }
}
