package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy

/** §2.H — a whole-operator custom plan: distributed top-K-per-group.
  *
  * The logical node declares WHAT (keep the K best rows per group); the
  * strategy plans it onto a physical operator that demands a hash
  * distribution on the group key and then streams each partition through a
  * bounded per-group buffer — O(groups·K) memory, no per-group sort, no
  * window function. This is the (c)-tier extension path (custom
  * LogicalPlan + Strategy + Exec) demonstrated end-to-end; the
  * Aggregator-based TopK (§2.A q_topk_group) is the (b)-tier equivalent.
  *
  * Ordering: rows rank by `orderCol` DESC, ties broken by `tiebreakCol`
  * ASC — a total order, so results are deterministic at any parallelism.
  */
case class TopKPerGroupNode(k: Int, keyCol: String, orderCol: String,
    tiebreakCol: String, child: LogicalPlan,
    partial: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  // the key/order/tiebreak columns are referenced by NAME (plain-string
  // fields carry no Expression for the default references derivation), so
  // declare them explicitly — otherwise ColumnPruning sees an
  // all-passthrough node referencing nothing and happily inserts a
  // pruning Project BELOW it when a parent selects a subset, silently
  // dropping the ordering column out of the exec's input (indexWhere
  // → -1 → unchecked out-of-bounds UnsafeRow read = garbage ordering).
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a =>
        a.name == keyCol || a.name == orderCol || a.name == tiebreakCol))
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

case class TopKPerGroupExec(k: Int, keyCol: String, orderCol: String,
    tiebreakCol: String, child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // all rows of a group must meet in one partition — Catalyst inserts the
  // hash exchange (and AQE sizes it) to satisfy this. The PARTIAL form is
  // the map-side combine: no required distribution, each input partition
  // reduces to ≤ groups·K rows IN PLACE, so only those survivors ever
  // reach the final phase's exchange (the aggregate partial/final split,
  // expressed for top-K).
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(
      Seq(child.output.find(_.name == keyCol).get)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyIdx = child.output.indexWhere(_.name == keyCol)
    val ordIdx = child.output.indexWhere(_.name == orderCol)
    val tieIdx = child.output.indexWhere(_.name == tiebreakCol)
    // fail loudly, never read a negative ordinal: UnsafeRow does NOT
    // bounds-check, so a pruned-away column would otherwise degrade to
    // silently-garbage ordering (how the missing-references bug surfaced)
    require(keyIdx >= 0 && ordIdx >= 0 && tieIdx >= 0,
      s"TopKPerGroup columns [$keyCol, $orderCol, $tiebreakCol] must all " +
        s"survive to the exec input; got ${child.output.map(_.name)}")
    val kk = k
    child.execute().mapPartitions { it =>
      // Per-group bounded buffers; rows must be copied out of the unsafe
      // row buffer the iterator reuses. A per-partition sequence number is
      // appended to the buffer key so rows that tie on BOTH orderCol and
      // tiebreakCol coexist instead of overwriting each other (the ordering
      // contract only needs (order, tiebreak) to be total for deterministic
      // OUTPUT; the seq makes the buffer key total unconditionally).
      val ord = Ordering.Tuple3[Double, Long, Long]
      val heaps = new java.util.HashMap[Long, java.util.TreeMap[(Double, Long, Long), InternalRow]]()
      var seq = 0L
      it.foreach { row =>
        val key = row.getLong(keyIdx)
        val rank = (-row.getDouble(ordIdx), row.getLong(tieIdx), seq)
        seq += 1
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.TreeMap[(Double, Long, Long), InternalRow](ord)
          heaps.put(key, heap)
        }
        if (heap.size < kk) heap.put(rank, row.copy())
        else if (ord.lt(rank, heap.lastKey())) {
          heap.remove(heap.lastKey())
          heap.put(rank, row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.values().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node onto the exec. Injected via
  * GraftExtensions (SparkSessionExtensions.injectPlannerStrategy). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, key, ord, tie, child, partial) =>
      TopKPerGroupExec(k, key, ord, tie, planLater(child), partial) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Keep the K rows with the largest `orderCol` per `keyCol` group
    * (ties → smallest `tiebreakCol`). key/tiebreak must be LongType,
    * order DoubleType. */
  def apply(df: DataFrame, k: Int, keyCol: String, orderCol: String,
      tiebreakCol: String, partial: Boolean = false): DataFrame = {
    val session = df.sparkSession
    // ensure the strategy is present even on sessions not built through
    // GraftSession (extraStrategies is the runtime hook; the
    // SparkSessionExtensions injection covers builder-time wiring)
    if (!session.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ TopKPerGroupStrategy
    org.apache.spark.sql.GraftShim.ofRows(session,
      TopKPerGroupNode(k, keyCol, orderCol, tiebreakCol,
        org.apache.spark.sql.GraftShim.logicalPlan(df), partial))
  }

  /** Two-phase top-K — the shape for a DATA-SCALED scored relation cut to
    * K per group (batched ANN's candidate cut: every (probe, row) score
    * for a handful of probes): a PARTIAL bounded-heap pass reduces each
    * input partition to ≤ groups·K rows with NO exchange, then the final
    * clustered pass merges the survivors — so the shuffle carries
    * partitions·groups·K rows, never the corpus. The top-K of the union
    * of per-partition top-Ks is the global top-K (any globally-kept row
    * is kept in its own partition), so the result is exactly
    * `apply(df, …)`'s. A per-probe `row_number` window here would instead
    * shuffle EVERY scored row into one task per group and sort it —
    * corpus-sized single-reducer partitions at scale. */
  def twoPhase(df: DataFrame, k: Int, keyCol: String, orderCol: String,
      tiebreakCol: String): DataFrame =
    apply(apply(df, k, keyCol, orderCol, tiebreakCol, partial = true),
      k, keyCol, orderCol, tiebreakCol)
}
