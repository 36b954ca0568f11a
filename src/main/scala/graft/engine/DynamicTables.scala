package graft.engine

import org.apache.spark.sql.{DataFrame, GraftPlans}
import org.apache.spark.sql.functions.{col, max, min, sum}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.StructType

/** Snowflake DYNAMIC TABLEs — declaratively maintained materialized
  * views with incremental refresh.
  *
  * Reference scope: universql forwards all non-table DDL (including
  * dynamic-table DDL) to Snowflake's cloud services
  * (`universql/protocol/session.py:82-85`); it has no local refresh
  * engine. Here the full lifecycle is local: `CREATE DYNAMIC TABLE …
  * AS SELECT` materializes the query, records a per-base-table offset
  * (the same snapshot file-set the CDC [[Streams]] keep), and `ALTER
  * DYNAMIC TABLE … REFRESH` advances the materialization.
  *
  * Scale shape (100 TB): the refresh cost must be O(changed data), not
  * O(base table) — a materialized view that rescans a 100 TB base on
  * every refresh is just a cron'd CTAS. Refresh picks the cheapest
  * sound path, decided from pure metadata (file-set comparison, no
  * Spark job):
  *
  *  1. '''no-op''' — every base's file set is unchanged: nothing runs.
  *  2. '''incremental-append''' — the defining query is stateless
  *     (select/filter/project over one base) and the base only gained
  *     files: the query runs over ONLY the added files and the result
  *     is appended to the materialization. O(delta) I/O, zero shuffle.
  *  3. '''incremental-merge''' — the defining query is a single-level
  *     aggregate whose functions are decomposable (SUM / COUNT / MIN /
  *     MAX / AVG, no DISTINCT or FILTER) over one base that only gained
  *     files: the aggregate runs over ONLY the added files and merges
  *     into the previous result (counts add, sums add, mins/maxes
  *     fold) — O(|result| + |delta|), one small shuffle. This is the
  *     map-side-combine identity that makes partial aggregation sound,
  *     applied across refreshes instead of across partitions. AVG is
  *     not itself mergeable; it is maintained through a partial-state
  *     sidecar table holding its (sum, count) pair — see [[AggMerge]].
  *  4. '''incremental-join-append / incremental-join-merge''' — the
  *     defining query is a stateless transform (or a decomposable
  *     aggregate) over a tree of INNER joins of n ≥ 2 bases, and every
  *     base only gained files. The multiset of new join rows partitions
  *     exactly by telescoping on the FIRST base whose contributing row
  *     is new:
  *     {{{ Δ(A₁⋈…⋈Aₙ) = ⊎ᵢ A₁_old⋈…⋈Aᵢ₋₁_old ⋈ ΔAᵢ ⋈ Aᵢ₊₁_new⋈…⋈Aₙ_new }}}
  *     (n = 2 is the familiar ΔA ⋈ B_new ⊎ A_old ⋈ ΔB). The refresh
  *     evaluates the defining query once per base that gained files,
  *     with the base views re-bound per the identity, unions the
  *     parts, and appends (stateless) or folds them into the previous
  *     result (aggregate). Each fact table is read only at O(delta);
  *     unchanged dimension sides are read at O(dim) — never the old
  *     fact files. This is the star-schema rollup case: at 100 TB the
  *     alternative is re-joining the whole fact table per refresh.
  *     Inner joins only — outer joins retract rows (a NULL-extended
  *     row must be deleted when its first match arrives), which an
  *     append-only materialization cannot express. A dynamic table
  *     whose own materialization is append-mode can serve as a base of
  *     another dynamic table and keep the chain incremental (its
  *     refresh is an in-place file append, indistinguishable from an
  *     INSERT to the change detector).
  *  5. '''full''' — anything else (outer joins, windows, DISTINCT
  *     aggregates, deletes/rewrites on a base, a base DT that
  *     merge-refreshes — its file set is swapped, not appended):
  *     re-run the defining query. Deletes break append-only deltas and
  *     MIN/MAX merging, so this fallback is what keeps every mode
  *     above sound.
  *
  * The mode is decided per refresh, so one DELETE on the base degrades
  * that one refresh to full — subsequent appends resume incremental
  * maintenance from the new offset. Incremental-eligibility of the
  * query itself is decided once at CREATE, from the ANALYZED Catalyst
  * plan (not the SQL text), so every dialect surface the rewriter
  * emits is classified by what it actually computes.
  */
object DynamicTables {

  sealed trait IncPlan
  /** Stateless select/filter/project over one base: refresh appends
    * transform(delta) — the base is never re-read. */
  case object AppendTransform extends IncPlan
  /** Single-level decomposable aggregate: refresh merges agg(delta)
    * into the previous result. `keys` are the output grouping columns;
    * `merges` maps each aggregate output column to its fold function
    * ("sum" | "min" | "max" — COUNT partials merge via sum).
    *
    * `avgs` are AVG output columns. AVG is not itself mergeable
    * (avg(A ⊎ B) ≠ f(avg(A), avg(B))) but decomposes into the mergeable
    * pair (sum, count) — the classic view-maintenance identity. When
    * non-empty, the session maintains a partial-state sidecar whose
    * schema replaces each avg column with [[sumCol]]/[[cntCol]]
    * partials ([[partialize]]); refreshes merge delta partials into the
    * state ([[stateSpec]]) and re-derive the visible materialization by
    * one O(|result|) projection ([[finalizeState]]). */
  final case class AggMerge(keys: Seq[String], merges: Seq[(String, String)],
      avgs: Seq[String] = Nil)
      extends IncPlan {
    /** Merge spec over the partial-state schema: visible mergeable
      * columns fold as themselves; each avg's sum and count partials
      * both fold by addition. */
    def stateSpec: AggMerge = AggMerge(keys,
      merges ++ avgs.flatMap(n => Seq((sumCol(n), "sum"), (cntCol(n), "sum"))))
  }

  private[graft] def sumCol(n: String) = s"__graft_avg_sum_$n"
  private[graft] def cntCol(n: String) = s"__graft_avg_cnt_$n"
  /** Stateless/decomposable query over a tree of INNER joins of n ≥ 2
    * bases: refresh computes the n telescoped parts (base i bound to its
    * delta, earlier bases to their old file sets, later bases to their
    * current state) and applies `inner` (AppendTransform → append the
    * parts; AggMerge → fold them into the previous result). Base order
    * is the session's sorted base list; the view re-binding makes the
    * assignment positional, not join-shape-dependent. */
  final case class JoinDelta(inner: IncPlan) extends IncPlan

  /** Last refresh's chosen path, for spec assertions:
    * "no-op" | "incremental-append" | "incremental-merge" | "full". */
  @volatile private[graft] var lastRefreshMode: String = ""
  /** Files the last incremental refresh read as its delta. */
  @volatile private[graft] var lastDeltaFiles: Seq[String] = Nil

  /** Classify the defining query's analyzed plan. `baseViews` are the
    * session temp-view names of the DT's bases (sorted by base FQN) —
    * used to verify each join side reads exactly one distinct base.
    * None = not incrementally maintainable (full refresh every time). */
  def incrementalPlan(plan: LogicalPlan, baseViews: Seq[String]): Option[IncPlan] = {
    val leafCount = plan.collectLeaves().length
    baseViews.length match {
      case 1 if leafCount == 1 =>
        strip(plan) match {
          case Aggregate(groupExprs, aggExprs, child, _) if stateless(child) =>
            classifyAgg(groupExprs, aggExprs)
          case p if stateless(p) => Some(AppendTransform)
          case _ => None
        }
      case n if n >= 2 && leafCount == n =>
        val (body, agg) = strip(plan) match {
          case Aggregate(g, a, child, _) => (child, Some((g, a)))
          case p                          => (p, None)
        }
        val want = baseViews.map(_.toLowerCase).toSet
        joinTree(body, want) match {
          case Some(covered) if covered == want =>
            agg match {
              case None         => Some(JoinDelta(AppendTransform))
              case Some((g, a)) => classifyAgg(g, a).map(JoinDelta(_))
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** Validate `p` as a tree of INNER/CROSS joins over stateless sides,
    * each side reading exactly one distinct base view; returns the base
    * views covered. The Δ-partition identity telescopes over ANY such
    * tree, regardless of shape or arity:
    * {{{ Δ(A₁⋈…⋈Aₙ) = ⊎ᵢ A₁ᵒˡᵈ⋈…⋈Aᵢ₋₁ᵒˡᵈ ⋈ ΔAᵢ ⋈ Aᵢ₊₁ⁿᵉʷ⋈…⋈Aₙⁿᵉʷ }}}
    * — every new result tuple has a unique FIRST base (in the fixed base
    * order) whose contributing row is new, so the n parts are disjoint
    * and together exhaustive. Inner/cross only: outer joins retract. */
  private def joinTree(p: LogicalPlan, want: Set[String]): Option[Set[String]] =
    p match {
      case Join(l, r, Inner | Cross, cond, _) if cond.forall(exprOk) =>
        for {
          lv <- joinTree(l, want)
          rv <- joinTree(r, want)
          if (lv & rv).isEmpty
        } yield lv ++ rv
      case _: Project | _: Filter | _: SubqueryAlias | _: View
          if p.expressions.forall(exprOk) &&
            p.exists(_.isInstanceOf[Join]) =>
        joinTree(p.children.head, want)
      case side if stateless(side) =>
        val vs = side.collect {
          case s: SubqueryAlias
              if want.contains(s.identifier.name.toLowerCase) =>
            s.identifier.name.toLowerCase
        }.toSet
        if (vs.size == 1) Some(vs) else None
      case _ => None
    }

  /** Every output column must be a grouping key or a decomposable
    * aggregate — SUM / COUNT / MIN / MAX fold directly, AVG through its
    * (sum, count) state pair; anything else (DISTINCT, FILTER,
    * expressions OVER aggregates like sum(x)+1) disqualifies the whole
    * query. */
  private def classifyAgg(groupExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      aggExprs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression])
      : Option[AggMerge] = {
    val cols = aggExprs.map {
      case a: Attribute if groupExprs.exists(_.semanticEquals(a)) =>
        ("key", a.name)
      case al: Alias if groupExprs.exists(_.semanticEquals(al.child)) =>
        ("key", al.name)
      case al: Alias => al.child match {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case _: Sum     => ("sum", al.name)
            case _: Count   => ("sum", al.name) // count partials add
            case _: Min     => ("min", al.name)
            case _: Max     => ("max", al.name)
            case _: Average => ("avg", al.name)
            case _          => ("no", al.name)
          }
        case _ => ("no", al.name)
      }
      case _ => ("no", "")
    }
    if (cols.exists(_._1 == "no")) None
    else Some(AggMerge(cols.filter(_._1 == "key").map(_._2),
      cols.collect { case (fn, n) if fn != "key" && fn != "avg" => (n, fn) },
      cols.collect { case ("avg", n) => n }))
  }

  /** Rewrite the top-level Aggregate of an AVG-bearing decomposable
    * query into its partial state: `avg(e) AS c` becomes
    * `sum(e) AS __graft_avg_sum_c, count(e) AS __graft_avg_cnt_c`
    * (COUNT(e) counts non-nulls, matching AVG's denominator); all other
    * output columns pass through. Safe to transform every Aggregate
    * node: classification only admits single-level aggregates over
    * stateless/join children, so the plan holds no nested Aggregate —
    * the join-delta caller partializes each telescoped part BEFORE
    * unioning for the same reason (a Union's children must agree on
    * arity). */
  def partialize(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed transform {
      case a: Aggregate =>
        val newExprs = a.aggregateExpressions.flatMap {
          case al @ Alias(ae: AggregateExpression, name)
              if ae.aggregateFunction.isInstanceOf[Average] &&
                !ae.isDistinct && ae.filter.isEmpty =>
            val e = ae.aggregateFunction.asInstanceOf[Average].child
            Seq(
              Alias(AggregateExpression(Sum(e), Complete, isDistinct = false),
                sumCol(name))(),
              Alias(AggregateExpression(Count(e), Complete, isDistinct = false),
                cntCol(name))())
          case other => Seq(other)
        }
        a.copy(aggregateExpressions = newExprs)
    }
    GraftPlans.ofRows(df.sparkSession, plan)
  }

  /** Derive the visible materialization from the merged partial state:
    * each avg column is its sum partial over its count partial (NULL
    * when the count is 0 — the sum partial is NULL too, and NULL/0 is
    * NULL — matching AVG over an all-NULL or empty group), cast back to
    * the declared output type; every other column passes through. */
  def finalizeState(state: DataFrame, am: AggMerge,
      schema: StructType): DataFrame =
    state.select(schema.fields.map { f =>
      if (am.avgs.contains(f.name))
        (col(sumCol(f.name)) / col(cntCol(f.name))).cast(f.dataType).as(f.name)
      else col(f.name).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)

  private def exprOk(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.deterministic && !e.exists(_.isInstanceOf[PlanExpression[_]])

  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => strip(c)
    case v: View             => strip(v.child)
    case _                   => p
  }

  /** Project/Filter chains with deterministic, subquery-free
    * expressions — rows map independently, so transform(delta) is
    * exactly the delta of the transform. */
  private def stateless(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case _: Project | _: Filter | _: SubqueryAlias | _: View =>
      p.expressions.forall(e => e.deterministic &&
        !e.exists(_.isInstanceOf[PlanExpression[_]])) &&
        p.children.forall(stateless)
    case _ => false
  }

  /** Fold agg(delta) into the previous result. Output is cast back to
    * the materialization's schema so type widening in the merge
    * aggregate (decimal SUM precision growth) can't drift the table's
    * schema across refreshes. A key-only plan (GROUP BY with no
    * aggregates) merges as distinct-of-union. */
  def merge(old: DataFrame, deltaAgg: DataFrame, plan: AggMerge,
      schema: StructType): DataFrame = {
    val names = schema.fieldNames.toIndexedSeq
    val both = old.select(names.map(col): _*)
      .unionByName(deltaAgg.select(names.map(col): _*))
    val merged =
      if (plan.merges.isEmpty) both.distinct()
      else {
        val aggs = plan.merges.map { case (n, fn) =>
          (fn match {
            case "sum" => sum(col(n))
            case "min" => min(col(n))
            case "max" => max(col(n))
          }).as(n)
        }
        both.groupBy(plan.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
    merged.select(schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }
}
