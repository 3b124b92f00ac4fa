package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Column <-> Expression conversion behind
  * `private[sql] classic.ExpressionUtils`; this bridge (the standard
  * extension-library pattern: a shim object inside the `org.apache.spark
  * .sql` namespace) re-exposes exactly the two conversions graft's custom
  * expressions need. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → catalyst conversion. `expression` wraps the column
    * node lazily (ColumnNodeExpression), which keeps non-serializable
    * internal nodes inside the tree and hides SortOrder from pattern
    * matches; this converts through to real catalyst expressions
    * (UnresolvedAttribute / catalyst SortOrder / ...) immediately.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Resolved logical plan of a DataFrame (for building custom logical
    * nodes over it).
    */
  def plan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
