package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` constructors that every third-party plan
  * library needs: building a DataFrame from a custom LogicalPlan node.
  * Lives under `org.apache.spark.sql` purely for access; contains no
  * Spark-derived logic.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Deliver all queued listener events (`listenerBus` is
    * private[spark]); graft.Metrics needs a drained bus before reading
    * task totals. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Column over a raw Catalyst Expression (`ExpressionUtils.column` is
    * private[sql]); needed to apply model-bound native expressions —
    * ones carrying a runtime reference object such as a PQ codebook —
    * which cannot route through the string-literal function registry. */
  def exprCol(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column (inverse of exprCol). */
  def colExpr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
