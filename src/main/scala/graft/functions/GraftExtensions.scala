package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions as SQL
  * functions (`adler32`, `rolling_fingerprint`), enabling
  * `spark.sql("SELECT adler32(...)")` alongside the Column API below.
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("adler32"),
      new ExpressionInfo(classOf[Adler32].getName, "adler32"),
      (children: Seq[Expression]) => Adler32(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprintExpr].getName, "rolling_fingerprint"),
      (children: Seq[Expression]) => RollingFingerprintExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("dotp"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dotp"),
      (children: Seq[Expression]) => DotProductExpr(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("wib_decode"),
      new ExpressionInfo(classOf[WibDecodeExpr].getName, "wib_decode"),
      (children: Seq[Expression]) => WibDecodeExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("zorder64"),
      new ExpressionInfo(classOf[ZOrder64Expr].getName, "zorder64"),
      (children: Seq[Expression]) => ZOrder64Expr(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinhashAggExpr].getName, "minhash_agg"),
      (children: Seq[Expression]) => MinhashAggExpr(children.head)))
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

/** Column-API access to the native expressions. */
object GraftFunctions {
  import org.apache.spark.sql.GraftShim
  def adler32(c: Column): Column = GraftShim.column(Adler32(GraftShim.expression(c)))
  def rollingFingerprint(c: Column): Column =
    GraftShim.column(RollingFingerprintExpr(GraftShim.expression(c)))
  def simhash64(c: Column): Column =
    GraftShim.column(Simhash64(GraftShim.expression(c)))
  def minhashSig(c: Column, k: Int): Column =
    GraftShim.column(MinhashSigExpr(GraftShim.expression(c), k))
  def hyperplaneSig(c: Column, planes: Array[Double],
                    tables: Int, bits: Int, dim: Int): Column =
    GraftShim.column(HyperplaneSigExpr(GraftShim.expression(c), planes, tables, bits, dim))
  def dotp(a: Column, b: Column): Column =
    GraftShim.column(DotProductExpr(GraftShim.expression(a), GraftShim.expression(b)))
  def wibDecode(c: Column): Column =
    GraftShim.column(WibDecodeExpr(GraftShim.expression(c)))
  def zorder64(a: Column, b: Column): Column =
    GraftShim.column(ZOrder64Expr(GraftShim.expression(a), GraftShim.expression(b)))
  def minhashAgg(c: Column): Column =
    GraftShim.column(MinhashAggExpr(GraftShim.expression(c)).toAggregateExpression())
  def bloomAgg(c: Column, numBits: Int = Blooms.DefaultBits): Column =
    GraftShim.column(BloomAggExpr(GraftShim.expression(c), numBits)
      .toAggregateExpression())
}
