package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Push a global Sort below computed projections when its keys pass through
  * them untouched — the optimizer-rule generalization of the repo's
  * hand-applied gate-sort pattern (`Tables.documentsById`).
  *
  * Why Spark doesn't already do this: in the Volcano view, Sort-above vs
  * Sort-below a 1:1 deterministic projection is cost-neutral, so no built-in
  * rule reorders them. Physically it is NOT neutral: a global Sort plans as
  * a range exchange whose partitioner runs a SAMPLING job over its child,
  * and when nothing below the sort provides reusable shuffle files, that
  * sampling job re-executes the entire projection chain — measured 2× on
  * every narrow query in this repo (ingest_normalize 2.42→1.00 s at sf0.1:
  * the child was a full to_json/from_json round trip, executed twice).
  * With the Sort below the Project, the sampler re-reads only the scan.
  *
  * Safety: fires only when (a) the sort is global, (b) every attribute a
  * sort key references is produced by the project's CHILD with the same
  * exprId (pass-through columns — an aliased computation never qualifies),
  * and (c) the projection is deterministic. Filters, generators, joins, and
  * aggregates are never crossed. Row order is unchanged: a deterministic
  * 1:1 projection maps the sorted stream element-wise.
  *
  * Heuristic: only projections that COMPUTE something (≥1 expression beyond
  * attribute/literal/re-alias) are crossed — pushing below a pure column
  * prune would widen the exchanged rows for no saved work. This is a
  * syntactic stand-in for "is the projection expensive"; like the built-in
  * rules, it trades a perfect cost model for a cheap, predictable trigger.
  *
  * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`); tests
  * mount it via `spark.experimental.extraOptimizations`.
  *
  * Deliberate division of labor: this repo's own gate queries KEEP their
  * explicit base-scan sorts (`Tables.documentsById`) rather than relying on
  * the rule — the oracle gate must not depend on an opt-in extension being
  * mounted, and two of the queries (the ingest round trips) sort on aliased
  * computations the rule correctly refuses to cross. The rule serves
  * sessions running arbitrary user queries, where hand-tuning every sort
  * site is not an option.
  */
object PushSortBelowProjects extends Rule[LogicalPlan] {

  private def passThrough(p: Project): Boolean =
    p.projectList.forall(_.deterministic)

  private def computesSomething(p: Project): Boolean =
    p.projectList.exists {
      case _: AttributeReference => false
      case Alias(_: AttributeReference, _) => false
      case Alias(_: Literal, _) => false
      case _: Literal => false
      case _ => true
    }

  private def keysFromChild(s: Sort, p: Project): Boolean = {
    val needed = s.order.flatMap(_.references.toSeq)
    needed.nonEmpty && needed.forall(a => p.child.outputSet.contains(a))
  }

  /** Recursively sink one Sort through a qualifying Project chain. */
  private def sink(s: Sort): LogicalPlan = s.child match {
    case p: Project if passThrough(p) && computesSomething(p) && keysFromChild(s, p) =>
      p.copy(child = sink(s.copy(child = p.child)))
    case _ => s
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case s: Sort if s.global => sink(s)
  }
}
