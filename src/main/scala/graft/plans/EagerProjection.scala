package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Eager projection (the projection half of Yan & Larson's eager/lazy
  * split, VLDB '95): in `Aggregate(g, F(e), Join(L, R))`, any aggregate
  * input or grouping expression `e` that references ONLY one join side is
  * computed BELOW that side's shuffle, and the side's projection narrowed
  * to the columns still needed above:
  *
  *   Aggregate(g(R), sum(price * (1 - disc)))
  *     Join(L, R, L.k = R.k)
  * →
  *   Aggregate(g(R), sum(_ep0))
  *     Join(Project(k, price * (1 - disc) AS _ep0, L), R, L.k = R.k)
  *
  * The exchange that feeds the join then carries one computed column
  * instead of every raw input (h09's fact shuffle drops from
  * (key, price, disc) to (key, product) — 1/3 narrower), and the
  * post-join stage stops re-evaluating the arithmetic per joined row.
  * MEASURED (single-node local[32], tools/EpProbe, h09 at 60 M rows):
  * a consistent 10-20% LOSS locally (mins 3.6-4.0 s on vs 3.3 s off,
  * and worse inside a long-lived bench JVM) — a local shuffle rides the
  * filesystem page cache, so the bytes saved are nearly free while the
  * early projection disturbs the scan stage's codegen pipeline. The
  * rule therefore defaults OFF (`spark.graft.eagerProjection=true` to
  * enable) and exists for the multi-node case this repo designs for,
  * where the exchange is network-bound and shuffled bytes are the cost:
  * h09's fact exchange narrows from (key, price, disc) 24 B/row to
  * (key, product) 16 B/row — a 1/3 cut in network volume that no local
  * benchmark can price. Same discipline as [[EagerAggregation]]'s
  * stats gate: Catalyst's default plan is the proven baseline, and an
  * unproven rewrite must be opt-in. Unlike eager
  * AGGREGATION (which trades shuffle volume for a keyed hash-aggregate
  * pass and needs a stats gate, [[EagerAggregation]]), eager projection
  * is pure projection algebra over an unchanged row multiset — same
  * multiply count, fewer shuffled bytes — so the only gate is
  * structural: it must make the side's projection strictly narrower (by
  * `defaultSize` accounting); otherwise the plan is left alone.
  *
  * Fired only for INNER joins (an outer join null-extends a side, so a
  * pushed non-null-propagating expression like coalesce/CASE would be
  * evaluated before the null-extension instead of over it) and only for
  * deterministic, non-trivial (not attribute/literal) expressions
  * without subqueries. Sound for every aggregate function: the join's
  * row multiset is untouched, each row just arrives with `e`
  * pre-computed.
  */
object EagerProjection extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    try conf.getConfString("spark.graft.eagerProjection", "false").trim.toBoolean
    catch { case _: IllegalArgumentException => false }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(_, _, child, _) if agg.resolved =>
        child match {
          case j: Join if j.resolved =>
            tryRewrite(agg, j).getOrElse(agg)
          // a Project between Aggregate and Join is either pure pruning or
          // the optimizer's complex-grouping extraction; inline it into
          // the aggregate and push — but only when every computed entry is
          // itself pushable, so the push preserves evaluate-once
          case p @ Project(pl, j: Join) if j.resolved =>
            val computed = pl.collect { case a: Alias => a.child }
              .filterNot(e => e.isInstanceOf[Attribute] || e.isInstanceOf[Literal])
            val allPushable = computed.forall(e =>
              candidate(e, j.left) || candidate(e, j.right))
            if (!allPushable) agg
            else {
              val aliasMap = pl.collect {
                case a: Alias => a.toAttribute.exprId -> a.child }.toMap
              def inline(e: Expression): Expression = e.transformUp {
                case ar: AttributeReference if aliasMap.contains(ar.exprId) =>
                  aliasMap(ar.exprId)
              }
              val inlined = Aggregate(
                agg.groupingExpressions.map(inline),
                agg.aggregateExpressions.map { ne =>
                  inline(ne) match {
                    case n: NamedExpression => n
                    case e => Alias(e, ne.name)(exprId = ne.exprId)
                  }
                },
                j, agg.hint)
              tryRewrite(inlined, j).getOrElse(agg)
            }
          case _ => agg
        }
    }
  }

  /** Candidate = deterministic non-trivial expression, all references on
    * one side, no subquery (couldn't move that plan fragment). */
  private def candidate(e: Expression, side: LogicalPlan): Boolean =
    !e.isInstanceOf[Attribute] && !e.isInstanceOf[Literal] &&
      e.deterministic && e.references.nonEmpty &&
      e.references.subsetOf(side.outputSet) &&
      !SubqueryExpression.hasSubquery(e)

  private def tryRewrite(agg: Aggregate, join: Join): Option[LogicalPlan] = {
    // Inner joins only: an outer join null-extends one side, and a
    // pushed non-null-propagating expression (coalesce, CASE, IS NULL)
    // would be computed before the null-extension instead of over it —
    // e.g. coalesce(r.x, 0) is 0 on an unmatched row in the original
    // plan but NULL once pushed below the extended side.
    if (join.joinType != org.apache.spark.sql.catalyst.plans.Inner)
      return None
    // expressions evaluated once per pre-join row: aggregate-function
    // inputs and grouping expressions
    val inputs: Seq[Expression] =
      agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae.aggregateFunction.children
      }).flatten ++ agg.groupingExpressions

    val joinRefs =
      join.condition.map(_.references).getOrElse(AttributeSet.empty)

    def sidePush(side: LogicalPlan): Option[Seq[Alias]] = {
      val cands = inputs.filter(candidate(_, side))
        .groupBy(_.canonicalized).map(_._2.head).toSeq
      if (cands.isEmpty) return None
      val absorbed = cands.map(_.canonicalized).toSet
      // this side's columns still needed above once candidates are
      // replaced: join condition + unabsorbed agg/grouping references
      val remaining = (agg.aggregateExpressions ++ agg.groupingExpressions)
        .flatMap(refsOutside(_, absorbed))
      val needed = (AttributeSet(remaining) ++ joinRefs)
        .intersect(side.outputSet)
      // strict-narrowing gate: dropped columns must outweigh the width of
      // the computed results added to the row
      val dropped = side.outputSet -- needed
      val savedBytes = dropped.toSeq.map(_.dataType.defaultSize).sum
      val addedBytes = cands.map(_.dataType.defaultSize).sum
      if (savedBytes <= addedBytes) None
      else Some(cands.zipWithIndex.map { case (e, i) => Alias(e, s"_ep$i")() })
    }

    val leftPush = sidePush(join.left)
    val rightPush = sidePush(join.right)
    if (leftPush.isEmpty && rightPush.isEmpty) return None

    val replacements: Map[Expression, Attribute] =
      (leftPush.getOrElse(Nil) ++ rightPush.getOrElse(Nil))
        .map(a => a.child.canonicalized -> a.toAttribute).toMap

    def project(side: LogicalPlan, push: Option[Seq[Alias]]): LogicalPlan =
      push match {
        case None => side
        case Some(aliases) =>
          val absorbed = aliases.map(_.child.canonicalized).toSet
          val remaining = (agg.aggregateExpressions ++ agg.groupingExpressions)
            .flatMap(refsOutside(_, absorbed))
          val needed = (AttributeSet(remaining) ++ joinRefs)
            .intersect(side.outputSet)
          Project(side.output.filter(needed.contains) ++ aliases, side)
      }

    val newJoin = join.copy(
      left = project(join.left, leftPush),
      right = project(join.right, rightPush))
    def replace(e: Expression): Expression = e.transformDown {
      case sub if replacements.contains(sub.canonicalized) =>
        replacements(sub.canonicalized)
    }
    Some(Aggregate(
      agg.groupingExpressions.map(replace),
      agg.aggregateExpressions.map(replace(_).asInstanceOf[NamedExpression]),
      newJoin, agg.hint))
  }

  /** References of `e` outside any subtree whose canonicalized form was
    * pushed down. */
  private def refsOutside(e: Expression, absorbed: Set[Expression]): Seq[Attribute] =
    if (absorbed.contains(e.canonicalized)) Nil
    else e match {
      case a: Attribute => Seq(a)
      case other => other.children.flatMap(refsOutside(_, absorbed))
    }
}
