package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, EqualNullSafe, Expression, NamedExpression, RowFrame,
  SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Join, JoinHint, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite FULL-FRAME window aggregates — the
  * `sum(x) OVER (PARTITION BY p)` annotation idiom (ratio-of-total,
  * share-of-group, group size attached to every row) — into a per-group
  * aggregation joined back to the input.
  *
  * The window form shuffles EVERY row on `p` and SORTS each partition
  * (WindowExec requires child ordering even when no ORDER BY is asked
  * for) just to attach one number per group. The rewritten plan
  * aggregates first — partial aggregation collapses each map task's
  * slice to one row per group, so the aggregate side is ~|groups| rows —
  * and joins the result back on null-safe group equality. Catalyst picks
  * the join strategy from its size estimate: below the broadcast
  * threshold the BIG SIDE IS NEVER SHUFFLED AT ALL (broadcast hash
  * join); above it, a shuffle join still beats the window by dropping
  * the per-partition sort. At 100 TB the common case (bounded group
  * cardinality) turns a full shuffle+sort into a scan + broadcast.
  *
  * Fires only on the exact safe shape: a Window with NO order spec whose
  * every expression is an order-INSENSITIVE aggregate (min/max/count/
  * sum/avg) over the resolved entire-partition frame. Order-sensitive
  * aggregates (first/last/collect_list) are left alone — their window
  * result depends on partition order, which an aggregation cannot
  * reproduce. For float sums/averages the accumulation ORDER may differ
  * from the window's partition order (the same merge-order freedom
  * Spark's own groupBy has; decimal/integral aggregates are exact).
  * Null group keys join null-safely, matching the window's null
  * partition. An EMPTY partition spec (a global total attached to every
  * row) rewrites too — to a single-row cross join, replacing the
  * worst window shape there is (every row sorted into ONE partition).
  * Disable with `spark.graft.windowAggRewrite.enabled=false`.
  */
object WindowAggRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.windowAggRewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case w @ Window(windowExprs, partSpec, Seq(), child, _)
          if windowExprs.nonEmpty && windowExprs.forall(isRewritableAgg) =>
        rewrite(w, partSpec, child)
    }
  }

  /** `Alias(WindowExpression(order-insensitive agg, entire-partition
    * frame))` — the shape the analyzer produces for a window aggregate
    * with no ORDER BY.
    */
  private def isRewritableAgg(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(ae: AggregateExpression, WindowSpecDefinition(_, _,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))), _) =>
      ae.aggregateFunction match {
        case _: Min | _: Max | _: Count | _: Sum | _: Average => true
        case _ => false
      }
    case _ => false
  }

  private def rewrite(
      w: Window, partSpec: Seq[Expression], child: LogicalPlan): LogicalPlan = {
    val gAliases = partSpec.map(e => Alias(e, "__graft_wk")())
    val aggPairs = w.windowExpressions.map {
      case orig @ Alias(WindowExpression(ae: AggregateExpression, _), name) =>
        (orig, Alias(ae, name)())
    }
    val agg = Aggregate(partSpec, gAliases ++ aggPairs.map(_._2), child)
    val cond = partSpec.zip(gAliases.map(_.toAttribute))
      .map { case (l, r) => EqualNullSafe(l, r): Expression }.reduceOption(And)
    val join = Join(child, agg, if (cond.isEmpty) Cross else Inner, cond, JoinHint.NONE)
    // reproduce the window's exact output: child columns pass through, the
    // window columns re-alias the aggregate results under their ORIGINAL
    // attribute ids so every downstream reference keeps resolving
    val restored = aggPairs.map { case (orig, inner) =>
      Alias(inner.toAttribute, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
    }
    Project(child.output ++ restored, join)
  }
}
