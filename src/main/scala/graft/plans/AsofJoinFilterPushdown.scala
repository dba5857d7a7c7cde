package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeMap, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Filter pushdown through [[AsofJoin]] — the optimizer `Rule` half of
  * the extension story. Catalyst's own PushDownPredicates cannot see
  * through an unknown node, so without this rule a `filter` applied
  * after `asofJoin` stalls above the operator and the predicate never
  * reaches the parquet scan.
  *
  * Only LEFT-side deterministic conjuncts move: each left row's match is
  * computed independently of other left rows, so dropping left rows
  * early cannot change any surviving row's result. Right-side predicates
  * must NOT be pushed — removing a right row can change which row is
  * "latest at or before" for a left row that still survives (and the
  * operator is left-outer: right columns are nullable output).
  */
object AsofJoinFilterPushdown extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Sink `cond` as deep as it will go through deterministic
    * Projects/Filters (alias-substituting on the way down), so the
    * predicate reaches the scan even though this rule runs AFTER
    * Catalyst's own pushdown batch (runtime `extraOptimizations` are a
    * post-hoc batch; only the `spark.sql.extensions` config path lands
    * inside the fixed-point operator-optimization batch).
    */
  private def sink(cond: Expression, plan: LogicalPlan): LogicalPlan = plan match {
    case p @ Project(fields, child) if fields.forall(_.deterministic) =>
      val aliases = AttributeMap(fields.collect {
        case a: Alias => (a.toAttribute, a.child)
      })
      val substituted = cond.transform {
        case a: Attribute => aliases.getOrElse(a, a)
      }
      if (substituted.references.subsetOf(child.outputSet)) {
        p.copy(child = sink(substituted, child))
      } else Filter(cond, p)
    case Filter(c, child) => Filter(And(c, cond), child)
    case other => Filter(cond, other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoin) =>
      val (pushable, kept) = splitConjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = sink(pushable.reduce(And), aj.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
