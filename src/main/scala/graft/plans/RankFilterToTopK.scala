package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan,
  LessThanOrEqual, NamedExpression, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the window rank-filter idiom into the bounded-
  * heap [[TopKPerKey]] operator when the rank itself is discarded.
  *
  * Matched shape (what `row_number().over(partitionBy(k).orderBy(o)) <= n`
  * followed by dropping the rank column leaves in the plan):
  *
  *   Project(cols without rn,
  *     Filter(rn <= n | rn < n | rn === 1,
  *       Window([rn := row_number() over (k, o)], k, o, child)))
  *
  * Conditions: the Window adds EXACTLY one window column and it is a plain
  * ROW_NUMBER (dense_rank/rank admit >k rows per key — not this rewrite),
  * the filter touches only that column, and the parent Project does not
  * reference it. The rewrite then needs no rank values at all, so the
  * whole window machinery — full shuffle of every row, per-partition sort
  * — collapses into partial/final bounded heaps (TopKBench: 2.1x at
  * sf0.1, and that is measured against Spark's own WindowGroupLimit
  * optimization, which prunes rows per partition but still sorts).
  *
  * Injected by `GraftExtensions`; exclude with
  * `spark.sql.optimizer.excludedRules=graft.plans.RankFilterToTopK` to
  * compare plans.
  */
object RankFilterToTopK extends Rule[LogicalPlan] {

  /** filter condition on the rank attribute → max kept rank, if safe. */
  private def keptK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rn) => Some(n)
    case LessThan(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rn) => Some(n - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(we: WindowExpression, _)), key, order, child, _)))
        if we.windowFunction.isInstanceOf[RowNumber] &&
          key.nonEmpty && order.nonEmpty &&
          // the filter must constrain ONLY the rank column
          cond.references.subsetOf(org.apache.spark.sql.catalyst.expressions.AttributeSet(
            Seq(alias.toAttribute))) &&
          // the parent must NOT need the rank values
          !p.references.contains(alias.toAttribute) &&
          projectList.forall(_.isInstanceOf[NamedExpression]) =>
      keptK(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          // Spark's InferWindowGroupLimit may already have inserted a
          // per-partition rank prune below the Window — the top-k bound
          // subsumes it, so strip it rather than double-filter.
          val base = child match {
            case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
              wgl.child
            case other => other
          }
          Project(projectList, TopKPerKey(key, order, k, base))
        case _ => p
      }
  }
}
