package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable QUANTILE sketches (datasketches KLL) — the third leg of the
  * sketch family next to Count-Min heavy hitters and HLL distincts
  * (operators/Sketches.scala): rank/quantile queries whose per-group state
  * is a bounded few-KB sketch instead of a data-scaled sorted list, and
  * whose binaries MERGE losslessly-in-error (the merged sketch carries the
  * same rank-error guarantee as sketching the union directly). That merge
  * property is what makes per-day / per-source / per-file sketches roll up
  * into corpus quantiles without rescanning — the same incremental-
  * analytics shape as the HLL register merge.
  *
  * All three are `TypedImperativeAggregate`s: Catalyst runs them with
  * map-side partial aggregation (ObjectHashAggregate), so each task folds
  * its rows locally and only serialized sketch buffers (KBs at k=200)
  * ever shuffle. KLL guarantees: with k=200, single-sided normalized rank
  * error ≤ ~1.65% at 99% confidence, for ANY input distribution.
  */

/** `kll_agg(cast(x AS DOUBLE) [, k])` — build a KLL doubles sketch over a
  * group. Returns the serialized sketch (BINARY) — persistable, and
  * re-foldable with [[KllMergeAggExpr]]. Null inputs add nothing; a group
  * with no non-null input yields an empty sketch (rank queries on it are
  * the caller's contract, same as datasketches'). */
case class KllAggExpr(child: Expression, k: Int = 200,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_agg requires DOUBLE input, got ${child.dataType.catalogString}")
  override def prettyName: String = "kll_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllAggExpr =
    copy(child = newChild)
}

/** `kll_merge_agg(sk)` — fold ALREADY-BUILT sketch binaries into their
  * union sketch (the roll-up: per-source rows in, one corpus sketch out)
  * without touching the underlying data. Null/empty binaries add
  * nothing. */
case class KllMergeAggExpr(child: Expression, k: Int = 200,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      if (bytes.nonEmpty) buf.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    }
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires BINARY (serialized sketch) input, got ${child.dataType.catalogString}")
  override def prettyName: String = "kll_merge_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAggExpr =
    copy(child = newChild)
}

/** `kll_quantiles(sk, fractions)` — evaluate rank fractions against a
  * serialized sketch, returning estimated quantile values (ARRAY<DOUBLE>;
  * null for a null/empty sketch). Runs on GROUP-SIZED rows only (one row
  * per sketch), so `CodegenFallback` costs nothing — the data-scaled work
  * happened inside the map-side aggregate. */
case class KllQuantilesExpr(child: Expression, fractions: Array[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) return null
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else new GenericArrayData(fractions.map(f => sk.getQuantile(f)))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires BINARY (serialized sketch) input, got ${child.dataType.catalogString}")
  override def prettyName: String = "kll_quantiles"

  override protected def withNewChildInternal(newChild: Expression): KllQuantilesExpr =
    copy(child = newChild)
}

object Kll {
  import org.apache.spark.sql.GraftShim
  def kllAgg(c: Column, k: Int = 200): Column =
    GraftShim.column(KllAggExpr(GraftShim.expression(c), k).toAggregateExpression())
  def kllMergeAgg(c: Column, k: Int = 200): Column =
    GraftShim.column(KllMergeAggExpr(GraftShim.expression(c), k).toAggregateExpression())
  def kllQuantiles(c: Column, fractions: Array[Double]): Column =
    GraftShim.column(KllQuantilesExpr(GraftShim.expression(c), fractions))
}
