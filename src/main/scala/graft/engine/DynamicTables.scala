package graft.engine

import org.apache.spark.sql.{DataFrame, GraftColumns, GraftPlans}
import org.apache.spark.sql.functions.{col, count_distinct, max, min, sum}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CommonExpressionRef, Expression, NamedExpression, PlanExpression, With}
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
  *     MAX / AVG / COUNT(DISTINCT), no FILTER clause) over one base that only gained
  *     files: the aggregate runs over ONLY the added files and merges
  *     into the previous result (counts add, sums add, mins/maxes
  *     fold) — O(|result| + |delta|), one small shuffle. This is the
  *     map-side-combine identity that makes partial aggregation sound,
  *     applied across refreshes instead of across partitions. AVG and
  *     expressions OVER aggregates (sum(x)+1, sum(a)/nullif(count(*),0))
  *     are not mergeable as values; they are maintained through a
  *     partial-state sidecar table holding each contained aggregate as
  *     its own column — see [[AggMerge]]. COUNT(DISTINCT x) is
  *     maintained by REFINING the sidecar's key granularity instead:
  *     x joins the state keys (one state row per (group, x), each
  *     sum-foldable and retractable), and the visible distinct count
  *     re-aggregates from the live state rows — see [[DistinctCol]].
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
  *  5. '''incremental-retract''' — a single base's file set changed
  *     NON-append (a file-granular Iceberg COW UPDATE/DELETE,
  *     [[graft.engine.Dml]]) and every state column folds linearly
  *     (SUM/COUNT/AVG shapes — [[AggMerge.retractable]]): the merge is
  *     invertible, so the refresh folds `+agg(added files)` and
  *     `−agg(removed files)` into the state, reading only the files
  *     the DML touched. Groups whose hidden row count reaches zero
  *     drop from the materialization. MIN/MAX are not invertible and
  *     disqualify this mode (not the ones above). Join trees retract
  *     too ('''incremental-join-retract'''): the telescoped identity
  *     holds with SIGNED deltas — each changed base contributes a
  *     +part over its added files and a −part over its removed files,
  *     under the same old/new bindings of the other bases.
  *  6. '''incremental-regroup''' — a single base's file set changed
  *     non-append and the state holds MIN/MAX (not invertible): the
  *     replaced files name every group the DML could have touched, so
  *     ONLY those groups are recomputed — the defining query re-runs
  *     under a key-IN-(touched) filter the optimizer pushes through
  *     the aggregate into the base scan — and spliced over the
  *     previous result. O(touched groups' data), keyed plans only.
  *  7. '''incremental-dtdelta''' — the single base is itself a
  *     DYNAMIC TABLE whose merge refresh swapped its materialization
  *     path: the base published its signed row delta (touched groups'
  *     rows before/after, chained per refresh), and this table
  *     consumes the chain directly — a retractable aggregate folds
  *     ±Q(delta rows), a stateless transform splices
  *     old ⊖ T(removed) ⊕ T(added) by exact multiset counting
  *     ([[spliceMultiset]]). O(changed groups), never O(base).
  *  8. '''full''' — anything else (outer joins, windows, expressions
  *     OVER a DISTINCT aggregate, whole-table rewrites on a base, a
  *     broken delta chain): re-run the defining query. This fallback is
  *     what keeps every mode above sound.
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
    * `derived` are output columns that are EXPRESSIONS over
    * decomposable aggregates — `avg(x)`, `sum(x) + 1`,
    * `sum(a) / nullif(count(*), 0)`, `round(avg(p), 2)` — which are not
    * mergeable as values (avg(A ⊎ B) ≠ f(avg(A), avg(B)); (sum+1)
    * partials would double the +1) but ARE maintainable through their
    * aggregate parts — the classic view-maintenance decomposition. When
    * non-empty, the session maintains a partial-state sidecar whose
    * schema carries each contained aggregate as its own column
    * ([[partialize]]); refreshes merge delta partials into the state
    * ([[stateSpec]]) and re-derive the visible materialization by one
    * O(|result|) projection ([[finalizeState]]). */
  final case class AggMerge(keys: Seq[String], merges: Seq[(String, String)],
      derived: Seq[DerivedCol] = Nil,
      having: Option[Expression] = None,
      distincts: Seq[DistinctCol] = Nil)
      extends IncPlan {
    /** The distinct-aggregate children as state key columns (deduped,
      * first-occurrence order — [[dkName]] indices). */
    def distinctStateKeys: Seq[String] =
      distincts.flatMap(_.stateKeys).distinct
    /** Merge spec over the partial-state schema: visible mergeable
      * columns fold as themselves; every derived partial folds by its
      * own function; the hidden [[RowCountCol]] group-cardinality
      * partial folds by sum. COUNT(DISTINCT x) refines the state
      * granularity instead of adding a partial: x joins the state KEYS
      * (one state row per (group, x)), so the state stays sum-foldable
      * and retractable — the visible distinct count is re-aggregated
      * from the state by [[finalizeState]]. The having filter plays no
      * part in merging — the state holds ALL groups unfiltered (a group
      * under the threshold in the delta may cross it after the merge,
      * and vice versa). */
    def stateSpec: AggMerge = AggMerge(keys ++ distinctStateKeys,
      merges ++ derived.flatMap(_.partials) :+ (RowCountCol -> "sum"))
    /** Every state column folds LINEARLY (sum — i.e. SUM/COUNT/AVG
      * shapes, no MIN/MAX anywhere): the merge is then invertible, so a
      * file-granular base rewrite (Iceberg COW UPDATE/DELETE,
      * [[graft.engine.Dml]]) refreshes by folding +agg(added files) and
      * −agg(removed files) instead of recomputing — groups whose hidden
      * row count reaches zero drop out in [[finalizeState]]. Vacuously
      * true for key-only (DISTINCT-shaped) plans, which retract through
      * the row count alone; COUNT(DISTINCT) plans retract the same way
      * at their finer state granularity (a (group, x) state row whose
      * rows are all deleted drops, decrementing the distinct count). */
    def retractable: Boolean =
      (merges ++ derived.flatMap(_.partials)).forall(_._2 == "sum")
    def needsState: Boolean =
      derived.nonEmpty || having.isDefined || retractable ||
        distincts.nonEmpty
  }

  /** One COUNT(DISTINCT …) output column: `stateKeys` name the state
    * key columns holding its child expressions ([[dkName]]); the
    * visible value is `count(distinct stateKeys)` over the group's
    * live state rows. */
  final case class DistinctCol(name: String, stateKeys: Seq[String])

  /** Deterministic state-key column name for the m-th distinct
    * semantically-unique distinct-aggregate child (first-occurrence
    * order over the output columns) — position-based so classify and
    * every later [[partialize]] of the re-analyzed delta query agree. */
  private def dkName(m: Int) = s"__graft_dk$m"

  /** Distinct-aggregate children across the output, deduped
    * semantically in first-occurrence order — the state key extension
    * shared by [[classifyAgg]] and [[partialize]]. */
  private def distinctChildren(aggExprs: Seq[NamedExpression]): Seq[Expression] = {
    val out = scala.collection.mutable.Buffer.empty[Expression]
    aggExprs.foreach {
      case al: Alias => inlineWith(al.child).foreach {
        case ae: AggregateExpression if ae.isDistinct =>
          ae.aggregateFunction.children.foreach { ch =>
            if (!out.exists(_.semanticEquals(ch))) out += ch
          }
        case _ =>
      }
      case _ =>
    }
    out.toSeq
  }

  /** Hidden partial-state column counting the rows behind each group —
    * what lets a retraction know a group emptied out (its aggregates
    * read 0/NULL then, but only rn = 0 distinguishes "no rows" from
    * "rows summing to zero"). Maintained in every state sidecar. */
  val RowCountCol = "__graft_rn"

  /** One derived output column: `partials` name each contained
    * aggregate's state column and its fold function (an AVG contributes
    * a sum and a count partial); `recipe` rebuilds the visible value
    * over the merged state — aggregate occurrences replaced by
    * references to their state columns, grouping-expression occurrences
    * by their output key columns. */
  final case class DerivedCol(name: String, partials: Seq[(String, String)],
      recipe: Expression)

  /** Deterministic state-column name for aggregate occurrence `j` of
    * output column `i` — position-based so the classify-time recipe and
    * every later [[partialize]] of the re-analyzed delta query (same
    * SQL text → same output shape) agree without sharing state. */
  private def pName(i: Int, j: Int) = s"__graft_p${i}_$j"

  /** Inline `With` common-subexpression nodes (NULLIF and friends
    * analyze into them in Spark 4): each CommonExpressionRef is replaced
    * by its definition's child. Both the classify-time recipe walk and
    * every partialize walk run on the SAME inlined tree, so aggregate
    * occurrence order (and count — a ref used twice duplicates its
    * aggregate, which just stores a redundant partial) stays aligned.
    * A naive transform of the un-inlined tree breaks: rebuilding a With
    * calls dataType on its defs, which an UnresolvedAttribute recipe
    * placeholder cannot answer. */
  private def inlineWith(e: Expression): Expression = e.transformUp {
    case w: With =>
      // defs are ordered and may reference earlier defs — inline
      // left-to-right so every ref lands on a fully-inlined tree
      var byId = Map.empty[org.apache.spark.sql.catalyst.expressions.CommonExpressionId, Expression]
      w.defs.foreach { d =>
        byId += (d.id -> d.child.transformUp {
          case r: CommonExpressionRef if byId.contains(r.id) => byId(r.id)
        })
      }
      w.child.transformUp {
        case r: CommonExpressionRef if byId.contains(r.id) => byId(r.id)
      }
  }
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
        unpeel(strip(plan)) match {
          case Some((Aggregate(groupExprs, aggExprs, child, _), cond))
              if stateless(child) =>
            classifyAgg(groupExprs, aggExprs, cond)
          case _ => strip(plan) match {
            case p if stateless(p) => Some(AppendTransform)
            case _ => None
          }
        }
      case n if n >= 2 && leafCount == n =>
        val (body, agg) = unpeel(strip(plan)) match {
          case Some((a: Aggregate, cond)) => (a.child, Some((a, cond)))
          case _                          => (strip(plan), None)
        }
        val want = baseViews.map(_.toLowerCase).toSet
        joinTree(body, want) match {
          case Some(covered) if covered == want =>
            agg match {
              case None => Some(JoinDelta(AppendTransform))
              case Some((a, cond)) =>
                classifyAgg(a.groupingExpressions, a.aggregateExpressions,
                  cond).map(JoinDelta(_))
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** Peel the HAVING shape off the top of an analyzed aggregate query:
    * `Aggregate`, `Filter(cond, Aggregate)` (HAVING over output
    * aliases), or `Project(attrs, Filter(cond, Aggregate))` (the
    * analyzer's shape when HAVING references aggregates not in the
    * SELECT list — it adds them to the Aggregate and projects them away
    * above). Returns the Aggregate and the optional filter condition.
    * Attribute-only projections are admitted: they drop/reorder columns
    * without computing, so the visible schema is just a subset of the
    * state's finalized columns. */
  private def unpeel(p: LogicalPlan)
      : Option[(Aggregate, Option[Expression])] = p match {
    case a: Aggregate => Some((a, None))
    case Filter(cond, a: Aggregate) => Some((a, Some(cond)))
    case Project(pl, Filter(cond, a: Aggregate))
        if pl.forall(_.isInstanceOf[Attribute]) => Some((a, Some(cond)))
    case _ => None
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

  /** Every output column must be a grouping key, a directly-mergeable
    * aggregate (SUM / COUNT / MIN / MAX fold in place), or a derivable
    * expression over decomposable aggregates and grouping expressions
    * (AVG, sum(x)+1, sum(a)/nullif(count(*),0), max(p)-min(p), …) —
    * anything else (DISTINCT, FILTER-modified aggs, nondeterminism,
    * subqueries, non-decomposable functions) disqualifies the whole
    * query.
    *
    * `cond` is a HAVING predicate over the aggregate's output. With one
    * present, every non-key output is forced through the derived path
    * so its state column carries a positionally-generated (parquet-
    * safe) name — analyzer-added helper columns (HAVING count(*) > n
    * with count not selected) are named like `count(1)`, which parquet
    * rejects — and the predicate is rewritten into a recipe over the
    * state that [[finalizeState]] applies AFTER merging: the state
    * keeps every group, filtered rows can re-appear once their merged
    * aggregates cross the threshold. */
  private def classifyAgg(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      cond: Option[Expression] = None): Option[AggMerge] = {
    def keyName(g: Expression): Option[String] = aggExprs.collectFirst {
      case a: Attribute if g.semanticEquals(a)     => a.name
      case al: Alias if g.semanticEquals(al.child) => al.name
    }
    // every grouping expression must be REPRESENTED in the output: the
    // merge re-groups the union of old result and delta by the OUTPUT
    // key columns, so a group key that is grouped on but not selected
    // (SELECT sum(x) FROM t GROUP BY k) would collapse per-k rows into
    // one — the materialization's row-per-group shape is only
    // maintainable when the keys survive into it
    if (!groupExprs.forall(g => keyName(g).isDefined)) return None

    def decomposable(ae: AggregateExpression): Boolean =
      !ae.isDistinct && ae.filter.isEmpty &&
        ae.aggregateFunction.children.forall(exprOk) &&
        (ae.aggregateFunction match {
          case _: Sum | _: Count | _: Min | _: Max | _: Average => true
          case _ => false
        })
    // re-derivable from (output keys + aggregate partials): every
    // attribute must sit under an aggregate or inside a grouping
    // expression — post-analysis that is guaranteed for valid
    // aggregates, so this check mainly rejects nondeterminism,
    // subqueries, and non-decomposable aggregate functions
    def derivable(e: Expression): Boolean = e match {
      case ae: AggregateExpression => decomposable(ae)
      case _ if groupExprs.exists(_.semanticEquals(e)) => true
      case _: Attribute => false
      case _ => e.deterministic && !e.isInstanceOf[PlanExpression[_]] &&
        e.children.forall(derivable)
    }
    // build the state recipe: aggregate occurrences → state-column
    // references (an Average → its sum/count pair divided, cast at the
    // avg's own result type so the rounding point matches a direct
    // evaluation), grouping-expression occurrences → output key columns
    def derive(al: Alias, i: Int): Option[DerivedCol] = {
      val child = inlineWith(al.child)
      if (!derivable(child)) return None
      val partials = scala.collection.mutable.Buffer.empty[(String, String)]
      var j = 0
      def fresh(fold: String): String = {
        val n = pName(i, j); j += 1; partials += ((n, fold)); n
      }
      val recipe = child.transformDown {
        case e if groupExprs.exists(_.semanticEquals(e)) =>
          UnresolvedAttribute.quoted(keyName(e).get)
        case ae: AggregateExpression => ae.aggregateFunction match {
          case avg: Average =>
            // re-derive through Average's OWN finalizer with its sum /
            // count buffer attributes substituted by the state columns
            // (the stored partials have exactly the buffer types:
            // Sum(child) = Average's widened sumDataType, Count = long)
            // — a hand-built Divide reproduced the value but not
            // Average's decimal precision/rounding rules, so a DT's
            // low-order digits could depend on whether a refresh ran
            // incrementally or full
            val sumRef = UnresolvedAttribute.quoted(fresh("sum"))
            val cntRef = UnresolvedAttribute.quoted(fresh("sum"))
            val Seq(bufSum, bufCnt) = avg.aggBufferAttributes
            avg.evaluateExpression.transformUp {
              case a: Attribute if a.exprId == bufSum.exprId => sumRef
              case a: Attribute if a.exprId == bufCnt.exprId => cntRef
            }
          case f =>
            val fold = f match {
              case _: Sum | _: Count => "sum"
              case _: Min            => "min"
              case _: Max            => "max"
            }
            UnresolvedAttribute.quoted(fresh(fold))
        }
      }
      if (partials.isEmpty) None // expression over keys only — stay full
      else Some(DerivedCol(al.name, partials.toList, recipe))
    }

    // with a HAVING cond, skip the plain-fold fast path: all non-key
    // state columns need generated names the cond recipe can target
    // (partialize mirrors this through its own `force` flag)
    val force = cond.isDefined
    // COUNT(DISTINCT …) columns: their children become extra state KEY
    // columns (one state row per (group, children)) — [[dkName]] indices
    // shared with [[partialize]] via [[distinctChildren]]
    val dks = distinctChildren(aggExprs)
    def dkOf(e: Expression): String =
      dkName(dks.indexWhere(_.semanticEquals(e)))
    sealed trait C
    case class K(name: String,
        id: org.apache.spark.sql.catalyst.expressions.ExprId) extends C
    case class M(name: String, fn: String) extends C
    case class D(d: DerivedCol,
        id: org.apache.spark.sql.catalyst.expressions.ExprId) extends C
    case class DK(d: DistinctCol,
        id: org.apache.spark.sql.catalyst.expressions.ExprId) extends C
    val cols: Seq[Option[C]] = aggExprs.zipWithIndex.map {
      case (a: Attribute, _) if groupExprs.exists(_.semanticEquals(a)) =>
        Some(K(a.name, a.exprId))
      case (al: Alias, _) if groupExprs.exists(_.semanticEquals(al.child)) =>
        Some(K(al.name, al.exprId))
      case (al: Alias, i) => inlineWith(al.child) match {
        // bare COUNT(DISTINCT …): the children name state key columns;
        // the visible value re-aggregates from the state in
        // [[finalizeState]] — exact at any refresh mode, including
        // retraction (a (group, x) state row emptying out decrements it)
        case ae: AggregateExpression
            if ae.isDistinct && ae.filter.isEmpty &&
              ae.aggregateFunction.isInstanceOf[Count] &&
              ae.aggregateFunction.children.nonEmpty &&
              ae.aggregateFunction.children.forall(exprOk) =>
          Some(DK(DistinctCol(al.name,
            ae.aggregateFunction.children.map(dkOf)), al.exprId))
        // fast path: a bare mergeable aggregate folds in place, no state
        case ae: AggregateExpression
            if !force && !ae.isDistinct && ae.filter.isEmpty &&
              ae.aggregateFunction.children.forall(exprOk) &&
              plainFold(ae.aggregateFunction).isDefined =>
          Some(M(al.name, plainFold(ae.aggregateFunction).get))
        case _ => derive(al, i).map(D(_, al.exprId))
      }
      case _ => None
    }
    if (cols.exists(_.isEmpty)) return None
    val cs = cols.flatten
    // rewrite the HAVING predicate into a recipe over the state: key
    // references → key columns, aggregate-output references → that
    // column's derived recipe; a distinct column's value exists only
    // after finalize's outer re-aggregation, where it carries its own
    // visible name
    val recipeById = cs.collect {
      case K(n, id)  => id -> (UnresolvedAttribute.quoted(n): Expression)
      case D(d, id)  => id -> d.recipe
      case DK(d, id) => id -> (UnresolvedAttribute.quoted(d.name): Expression)
    }.toMap
    val having: Option[Expression] = cond match {
      case None => None
      case Some(c0) =>
        val c = inlineWith(c0)
        if (!exprOk(c) ||
            !c.references.forall(a => recipeById.contains(a.exprId)))
          return None
        Some(c.transformUp {
          case a: Attribute if recipeById.contains(a.exprId) =>
            recipeById(a.exprId)
        })
    }
    // HAVING over a distinct aggregate's value would need the filter
    // applied after finalize's outer aggregation referencing the
    // distinct column — finalizeState does exactly that, but only in
    // the distinct path; a HAVING with distincts about and NO distinct
    // references is fine either way. Conservatively reject only the
    // unimplementable combination: none (both orders are handled).
    Some(AggMerge(cs.collect { case K(n, _) => n },
      cs.collect { case M(n, f) => (n, f) },
      cs.collect { case D(d, _) => d },
      having,
      cs.collect { case DK(d, _) => d }))
  }

  /** Fold function of a directly-mergeable aggregate, None otherwise
    * (AVG and anything non-decomposable go through the derived path). */
  private def plainFold(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction)
      : Option[String] = f match {
    case _: Sum | _: Count => Some("sum")
    case _: Min            => Some("min")
    case _: Max            => Some("max")
    case _                 => None
  }

  /** Rewrite the top-level Aggregate of a derived-bearing decomposable
    * query into its partial state: each derived output column is
    * replaced by one state column per contained aggregate (an Average
    * by sum(e) + count(e) — COUNT(e) counts non-nulls, matching AVG's
    * denominator), named positionally to match the classify-time recipe
    * ([[pName]]); keys and directly-mergeable aggregates pass through.
    * Safe to transform every Aggregate node: classification only admits
    * single-level aggregates over stateless/join children, so the plan
    * holds no nested Aggregate — the join-delta caller partializes each
    * telescoped part BEFORE unioning for the same reason (a Union's
    * children must agree on arity). */
  def partialize(df: DataFrame, force: Boolean = false): DataFrame = {
    // drop the HAVING filter (and the attribute projection above it) so
    // the delta state is UNFILTERED — a group below the threshold in
    // the delta may cross it after the merge, and vice versa
    val analyzed = df.queryExecution.analyzed match {
      case Filter(_, a: Aggregate) => a
      case Project(pl, Filter(_, a: Aggregate))
          if pl.forall(_.isInstanceOf[Attribute]) => a
      case p => p
    }
    val plan = analyzed transform {
      case a: Aggregate =>
        val g = a.groupingExpressions
        // COUNT(DISTINCT …) children refine the state granularity: they
        // join the GROUPING expressions (one state row per (group,
        // children)) under [[dkName]] aliases, and the distinct output
        // columns themselves emit NO partial — finalizeState
        // re-aggregates them from the state keys
        val dks = distinctChildren(a.aggregateExpressions)
        val newExprs: Seq[NamedExpression] =
          a.aggregateExpressions.zipWithIndex.flatMap {
            case (ne, _) if ne.isInstanceOf[Attribute] ||
                g.exists(_.semanticEquals(ne)) => Seq(ne)
            case (al: Alias, _) if g.exists(_.semanticEquals(al.child)) =>
              Seq(al)
            case (al: Alias, i) => inlineWith(al.child) match {
              case ae: AggregateExpression if ae.isDistinct => Nil
              case ae: AggregateExpression
                  if !force && plainFold(ae.aggregateFunction).isDefined =>
                Seq(al)
              case _ =>
                // derived: emit partials in the SAME pre-order the
                // classify-time recipe assigned names in (grouping
                // expressions cannot contain aggregates, so skipping
                // their replacement here cannot shift the order)
                val buf = scala.collection.mutable.Buffer.empty[NamedExpression]
                var j = 0
                def add(fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Unit = {
                  buf += Alias(AggregateExpression(fn, Complete,
                    isDistinct = false), pName(i, j))()
                  j += 1
                }
                inlineWith(al.child).transformDown {
                  case ae: AggregateExpression =>
                    ae.aggregateFunction match {
                      case avg: Average =>
                        add(Sum(avg.child)); add(Count(avg.child))
                      case f => add(f)
                    }
                    ae
                }
                buf.toSeq
            }
            case (other, _) => Seq(other)
          }
        val dkAliases: Seq[NamedExpression] =
          dks.zipWithIndex.map { case (e, m) => Alias(e, dkName(m))() }
        // hidden group-cardinality partial, present in every state
        // sidecar — folds by sum, negates under retraction, and lets
        // finalizeState drop groups whose last row was retracted
        a.copy(groupingExpressions = g ++ dks,
          aggregateExpressions = newExprs ++ dkAliases :+ Alias(
          AggregateExpression(
            Count(org.apache.spark.sql.catalyst.expressions.Literal(1)),
            Complete, isDistinct = false), RowCountCol)())
    }
    GraftPlans.ofRows(df.sparkSession, plan)
  }

  /** Negate a partialized delta: every state column folds by SUM when
    * this is called (guarded by [[AggMerge.retractable]]), so flipping
    * the sign turns the fold into a retraction — the refresh merges
    * `old ⊎ (+Δadded) ⊎ (−Δremoved)`. Keys pass through. */
  def negateState(delta: DataFrame, am: AggMerge): DataFrame = {
    val neg = am.stateSpec.merges.map(_._1).toSet
    delta.select(delta.schema.fields.map { f =>
      if (neg.contains(f.name))
        (col(f.name) * org.apache.spark.sql.functions.lit(-1))
          .cast(f.dataType).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }

  /** Derive the visible materialization from the merged partial state:
    * each derived column evaluates its recipe over the state (NULL
    * count-0 avg groups come out NULL — sum partial NULL, NULL/0 is
    * NULL — matching AVG over an all-NULL group), cast back to the
    * declared output type; every other column passes through. */
  def finalizeState(state: DataFrame, am: AggMerge,
      schema: StructType): DataFrame = {
    val byName = am.derived.map(d => d.name -> d).toMap
    // groups whose hidden row count was retracted to zero have no rows
    // behind them — they must vanish from the materialization (their
    // sum/count columns read 0, not absent). Append-only refreshes
    // never drive rn to 0, so the filter is the identity there.
    val live =
      if (state.columns.contains(RowCountCol))
        state.filter(col(RowCountCol) > 0)
      else state
    if (am.distincts.nonEmpty)
      return finalizeDistinct(live, am, schema)
    // HAVING applies over the merged state, BEFORE the projection —
    // its recipe may reference helper aggregates the SELECT dropped
    val filtered = am.having.fold(live)(h =>
      live.filter(GraftColumns.ofExpr(h)))
    filtered.select(schema.fields.map { f =>
      byName.get(f.name) match {
        case Some(d) =>
          GraftColumns.ofExpr(d.recipe).cast(f.dataType).as(f.name)
        case None => col(f.name).cast(f.dataType).as(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Distinct-bearing finalize: the state is one row per (group,
    * distinct children), so the visible table re-aggregates by the
    * output keys — every stored partial folds by its own function
    * (exactly the cross-refresh merge identity, applied across state
    * rows of one group), each COUNT(DISTINCT …) counts its distinct
    * state-key tuples over live rows, and derived recipes/HAVING
    * evaluate over the re-aggregated columns (same names). One
    * O(|state|) job — state is O(distinct pairs), never the base. */
  private def finalizeDistinct(live: DataFrame, am: AggMerge,
      schema: StructType): DataFrame = {
    def bq(n: String) = col(s"`$n`")
    def fold(n: String, fn: String) = (fn match {
      case "sum" => sum(bq(n))
      case "min" => min(bq(n))
      case "max" => max(bq(n))
    }).as(n)
    val outer: Seq[org.apache.spark.sql.Column] =
      am.merges.map { case (n, fn) => fold(n, fn) } ++
      am.derived.flatMap(_.partials).map { case (n, fn) => fold(n, fn) } ++
      am.distincts.map { d =>
        count_distinct(bq(d.stateKeys.head),
          d.stateKeys.tail.map(bq): _*).as(d.name)
      }
    val agged =
      if (am.keys.isEmpty) live.agg(outer.head, outer.tail: _*)
      else live.groupBy(am.keys.map(bq): _*).agg(outer.head, outer.tail: _*)
    val filtered = am.having.fold(agged)(h =>
      agged.filter(GraftColumns.ofExpr(h)))
    val byName = am.derived.map(d => d.name -> d).toMap
    filtered.select(schema.fields.map { f =>
      byName.get(f.name) match {
        case Some(d) =>
          GraftColumns.ofExpr(d.recipe).cast(f.dataType).as(f.name)
        case None => bq(f.name).cast(f.dataType).as(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Exact multiset splice `old ⊖ minus ⊕ plus` for a stateless
    * transform consuming a base's signed row delta: rows group by ALL
    * columns (null-safe, as groupBy is), net count = old − minus,
    * survivors re-expand to their net multiplicity, `plus` appends.
    * One shuffle over the materialization — downstream of an aggregate
    * that is O(groups), never O(base). */
  def spliceMultiset(old: DataFrame, minus: DataFrame, plus: DataFrame,
      schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{explode, lit, sequence}
    val c = "__graft_mc"
    val names = schema.fieldNames.toIndexedSeq
    def aligned(df: DataFrame) = df.select(schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    aligned(old).withColumn(c, lit(1L))
      .unionByName(aligned(minus).withColumn(c, lit(-1L)))
      .groupBy(names.map(col): _*)
      .agg(sum(col(c)).as(c))
      .filter(col(c) > 0)
      .withColumn("__graft_rep", explode(sequence(lit(1L), col(c))))
      .select(names.map(col): _*)
      .unionByName(aligned(plus))
  }

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
