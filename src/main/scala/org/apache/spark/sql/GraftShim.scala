package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters, the
  * standard pattern for libraries that ship native Catalyst expressions
  * (cf. public extension projects like Qbeast's DatasetFactory shim).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Block until the async listener bus has delivered all queued events —
    * needed before reading job counts off a SparkListener in tests
    * (`listenerBus` is `private[spark]`, hence this shim). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
