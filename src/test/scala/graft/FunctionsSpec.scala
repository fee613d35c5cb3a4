package graft

import graft.functions.{GraftExtensions, GraftFunctions, RollingFingerprint}
import org.apache.spark.sql.functions._

class FunctionsSpec extends GraftSpec {

  test("minhash_agg: group signature = elementwise min = signature of the token-set union; partial ObjectHashAggregate") {
    val K = 16
    val sigs = Tables.documents(spark, sf)
      .select(col("source"), col("text"),
        GraftFunctions.minhashSig(col("text"), K).as("sig"))
    val grouped = sigs.groupBy(col("source"))
      .agg(GraftFunctions.minhashAgg(col("sig")).as("gsig"))
    val got = grouped.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    // reference 1: per-position min over the rows' signatures
    val byMin = sigs
      .select(col("source"), posexplode(col("sig")).as(Seq("p", "v")))
      .groupBy(col("source"), col("p")).agg(min(col("v")).as("m"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.sortBy(_.getAs[Int]("p")).map(_.getAs[Long]("m")) }
    assert(got.keySet == byMin.keySet)
    got.foreach { case (s, g) =>
      assert(g.sameElements(byMin(s)), s"group $s: agg != positionwise min") }
    // reference 2: the MinHash property — the group signature IS the
    // signature of the union of the group's token sets
    val unioned = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(concat_ws(" ", collect_list(col("text"))).as("alltext"))
      .select(col("source"), GraftFunctions.minhashSig(col("alltext"), K).as("usig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    got.foreach { case (s, g) =>
      assert(g.sameElements(unioned(s)), s"group $s: agg != union signature") }
    // the custom aggregate must run with map-side partial aggregation
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate should plan as ObjectHashAggregate:\n${plan.take(1200)}")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial + final aggregate nodes")
  }

  test("adler32 expression matches java.util.zip.Adler32 (codegen path)") {
    val rows = Tables.documents(spark, sf).limit(50)
      .select(col("text"), GraftFunctions.adler32(col("text").cast("binary")).as("a"))
      .collect()
    rows.foreach { r =>
      val ref = new java.util.zip.Adler32()
      ref.update(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) == ref.getValue, s"adler mismatch for ${r.getString(0).take(20)}")
    }
  }

  test("adler32 matches the reference zlib value for a known vector") {
    // zlib.adler32(b"Wikipedia") == 0x11E60398 — published reference value
    val got = spark.range(1)
      .select(GraftFunctions.adler32(lit("Wikipedia").cast("binary")).as("a"))
      .collect().head.getLong(0)
    assert(got == 0x11E60398L)
  }

  test("rolling fingerprint: equal texts equal, local edit usually preserved") {
    val a = RollingFingerprint.fingerprint("the quick brown fox jumps over the lazy dog".getBytes)
    val b = RollingFingerprint.fingerprint("the quick brown fox jumps over the lazy dog".getBytes)
    assert(a == b)
    // short strings take the whole-payload path
    val s1 = RollingFingerprint.fingerprint("abc".getBytes)
    assert(s1 == RollingFingerprint.fingerprint("abc".getBytes))
    assert(s1 != RollingFingerprint.fingerprint("abd".getBytes))
  }

  test("expressions register as SQL functions via SparkSessionExtensions hook") {
    // the extension applies to a fresh session's registry; simulate by
    // registering into this session's registry through the same code path
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // sanity: Column API and eval agree with SQL usage after manual register
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("adler32"),
      new ExpressionInfo(classOf[graft.functions.Adler32].getName, "adler32"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.Adler32(children.head))
    val viaSql = spark.sql("SELECT adler32(cast('Wikipedia' as binary)) AS a")
      .collect().head.getLong(0)
    assert(viaSql == 0x11E60398L)
  }

  test("dotp SQL function matches the strict left-fold dot") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("dotp"),
      new ExpressionInfo(classOf[graft.functions.DotProductExpr].getName, "dotp"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProductExpr(children.head, children(1)))
    val got = spark.sql(
      "SELECT dotp(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(got == (1.0 * 4.0 + 2.0 * 5.0 + 3.0 * 6.0))
  }

  test("dotp matches the HOF formulation on edge inputs (null elements, length mismatch)") {
    // HOF reference: aggregate(zip_with(a, b, *), 0.0, +) — null element
    // poisons the fold; zip_with pads a length mismatch with nulls → NULL
    val cases = Seq(
      ("array(1.0d, 2.0d)", "array(3.0d, 4.0d)"),
      ("array(1.0d, cast(null as double))", "array(3.0d, 4.0d)"),
      ("array(1.0d, 2.0d, 5.0d)", "array(3.0d, 4.0d)"),
      ("array(cast(null as double))", "array(cast(null as double))"))
    cases.foreach { case (a, b) =>
      val r = spark.sql(
        s"""SELECT dotp($a, $b) AS native,
           |  aggregate(zip_with($a, $b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS hof
           |""".stripMargin).collect().head
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"dotp($a, $b) nullness diverges from the HOF form")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("zorder64 interleaves bits Morton-style and is monotone per dimension") {
    import graft.functions.ZOrder
    // reference vectors: a's bits land even, b's bits land odd
    assert(ZOrder.interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    assert(ZOrder.interleave(0L, 0xffffffffL) == 0xaaaaaaaaaaaaaaaaL)
    assert(ZOrder.interleave(0xffffffffL, 0xffffffffL) == -1L)
    assert(ZOrder.interleave(1L, 0L) == 1L && ZOrder.interleave(0L, 1L) == 2L)
    assert(ZOrder.interleave(3L, 1L) == 7L) // a=11 -> 0101, b=01 -> 0010
    // monotone per dimension (the property range clustering relies on)
    for (x <- 0L until 64L) {
      assert(ZOrder.interleave(x, 7L) < ZOrder.interleave(x + 1, 7L))
      assert(ZOrder.interleave(7L, x) < ZOrder.interleave(7L, x + 1))
    }
    // the codegen Column path agrees with the Scala reference
    val r = spark.range(1).select(graft.functions.GraftFunctions.zorder64(
      org.apache.spark.sql.functions.lit(12345L),
      org.apache.spark.sql.functions.lit(67890L))).head()
    assert(r.getLong(0) == ZOrder.interleave(12345L, 67890L))
  }
}
