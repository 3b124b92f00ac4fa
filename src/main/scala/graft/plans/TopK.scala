package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge

/** Planner strategy: TopKPerKey → map-side LocalTopKExec under the
  * final TopKPerKeyExec (the exchange between them comes from
  * requiredChildDistribution).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyExec(t.keys, t.order, t.k, t.rankAttr,
        LocalTopKExec(t.keys, t.order, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** SparkSessionExtensions entry point
  * (`spark.sql.extensions=graft.plans.GraftExtensions`): the TopKPerKey
  * planner strategy plus every graft native function/generator under
  * its SQL name (see functions.GraftFunctions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftFunctions", name),
        builder))
    }
  }
}

/** Column-API front end for the custom operator. */
object TopK {

  /** Ensure the strategy is planned on this session (idempotent; the
    * `spark.sql.extensions` config path via [[GraftExtensions]] is the
    * deployment-time alternative).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
  }

  /** Top `k` rows per `keyCols` group under `orderBy` (build the sort
    * with `col(...).desc` / `.asc` — exactly `row_number` semantics),
    * with the rank appended as `rankCol`.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
             k: Int, rankCol: String = "rk"): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val keys = keyCols.map(c => ColumnBridge.eagerExpression(df(c)))
    val order = orderBy.map { c =>
      ColumnBridge.eagerExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    val rankAttr = org.apache.spark.sql.catalyst.expressions
      .AttributeReference(rankCol, org.apache.spark.sql.types.IntegerType,
        nullable = false)()
    ColumnBridge.ofRows(spark,
      TopKPerKey(keys, order, k, rankAttr, ColumnBridge.plan(df)))
  }
}
