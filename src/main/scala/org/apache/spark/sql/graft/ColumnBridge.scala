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
}
