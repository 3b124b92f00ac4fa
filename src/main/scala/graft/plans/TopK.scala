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

/** Optimizer rule: rewrite the plain-SQL top-k idiom
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY k ORDER BY s) rk FROM t) WHERE rk <= N
  *
  * into the [[TopKPerKey]] heap operator, so SQL users get the
  * map-side-pruned plan (at most k rows per key per partition reach
  * the exchange, nothing fully sorts) without knowing the operator
  * exists. Fires only on the exact-equivalence shape: a Filter whose
  * condition bounds the rank from above, over a Window computing a
  * single row_number with non-empty partition AND order specs (an
  * empty order makes row_number nondeterministic — left alone). Other
  * conjuncts in the filter (including the optimizer's inferred
  * `isnotnull(rk)`) are preserved in a Filter above the rewrite; the
  * rank attribute keeps its exprId, so parent plans resolve unchanged.
  */
object RowNumberToTopK
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}
  import org.apache.spark.sql.types.IntegerType

  private def bound(c: Expression, rk: Attribute): Option[Int] = c match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rk) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rk) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rk) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rk) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rk) && k == 1 => Some(1)
    case _ => None
  }

  private def frameOk(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        true
      case UnspecifiedFrame => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(we: WindowExpression, _)), _, _, child, _))
        if we.windowFunction.isInstanceOf[RowNumber] &&
          we.windowSpec.partitionSpec.nonEmpty &&
          we.windowSpec.orderSpec.nonEmpty && frameOk(we.windowSpec) =>
      val rk = alias.toAttribute.asInstanceOf[AttributeReference]
      val conjuncts = splitConjunctivePredicates(cond)
      conjuncts.flatMap(c => bound(c, rk).map(c -> _)) match {
        case (boundConj, k) :: _ if k > 0 =>
          val topk = TopKPerKey(we.windowSpec.partitionSpec,
            we.windowSpec.orderSpec, k, rk, child)
          // drop the consumed bound and the redundant isnotnull(rk)
          // (rank is never null); keep everything else above
          val rest = conjuncts.filterNot { c =>
            (c eq boundConj) ||
              (c match {
                case IsNotNull(a: Attribute) => a.semanticEquals(rk)
                case _ => false
              })
          }
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
        case _ => f
      }
  }
}

/** SparkSessionExtensions entry point
  * (`spark.sql.extensions=graft.plans.GraftExtensions`): the TopKPerKey
  * planner strategy, the [[RowNumberToTopK]] rewrite, plus every graft
  * native function/generator under its SQL name (see
  * functions.GraftFunctions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => RowNumberToTopK)
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
