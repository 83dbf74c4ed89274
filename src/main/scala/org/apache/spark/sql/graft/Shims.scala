package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway the engine needs: turning a hand-built
  * [[LogicalPlan]] (e.g. [[graft.plans.AsOfJoinNode]]) back into a public
  * `DataFrame`. Spark offers no public constructor for this — every
  * extension library sits in an `org.apache.spark.sql` subpackage for
  * exactly this call. Nothing else may go through here: all other engine
  * code uses only public API.
  */
object Shims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (public via queryExecution). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a hand-built Catalyst expression (e.g. a programmatic
    * [[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression]]
    * over [[graft.functions.TopKRows]]) as a public Column.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)
}
