package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, DeclarativeAggregate, Partial}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec

/** Bypass the partial (map-side) aggregation step of a two-phase hash
  * aggregate when it barely reduces the data.
  *
  * Spark always plans `FinalAgg ← Exchange ← PartialAgg ← scan`. When
  * the group key is high-cardinality relative to the per-task row count
  * (h03's `l_partkey`: ~2 M distinct keys over ~1.9 M rows per task), the
  * partial aggregate builds a near-full-size hash map per task to shrink
  * the shuffle only fractionally — all hash-insert cost, no combine
  * benefit. OSS Spark has no conf to skip it (the two-level-map
  * `partialOnly` knob tunes the map, not the phase), so this physical
  * rule replaces the partial [[HashAggregateExec]] with a [[ProjectExec]]
  * that emits each row AS a single-row aggregation buffer: for every
  * [[DeclarativeAggregate]] slot, the update expression evaluated against
  * the initial buffer values, aliased to the function's
  * `inputAggBufferAttributes` exprIds so the final aggregate's merge
  * expressions resolve unchanged. The exchange then carries one buffer
  * row per input row; the final aggregate merges exactly as before
  * (merge(init→update(row)) ≡ update(row) — the same identity partial
  * aggregation itself relies on).
  *
  * Runs as an AQE query-stage preparation rule (after EnsureRequirements,
  * so the exchange already hangs above the partial agg it replaces).
  *
  * Modes (`spark.graft.skipPartialAggregation`):
  *  - `off` (default) — never fires.
  *  - `force` — fires on every eligible partial agg (A/B probing).
  *  - `auto` — fires when column stats prove the partial agg reduces
  *    rows by less than `spark.graft.skipPartialAggregation.maxReduction`
  *    (default 2.0) per PER-TASK distinct key: reduction =
  *    rows/task ÷ min(ndv, rows/task). Without rowCount + ndv stats the
  *    rule never fires — Catalyst's default is the proven baseline.
  *
  * Eligible: grouped (never global — its partial collapses to one row
  * per task, the best case), all modes Partial, no DISTINCT, no FILTER,
  * declarative functions only (imperative buffers are opaque).
  */
object SkipPartialAggregation extends Rule[SparkPlan] {

  private val ModeConf = "spark.graft.skipPartialAggregation"
  private val MaxReductionConf = "spark.graft.skipPartialAggregation.maxReduction"

  override def apply(plan: SparkPlan): SparkPlan = {
    val mode = conf.getConfString(ModeConf, "off").toLowerCase
    if (mode == "off") return plan
    plan.transformUp {
      case agg: HashAggregateExec if eligible(agg) &&
          (mode == "force" || (mode == "auto" && lowReduction(agg))) =>
        rewrite(agg)
    }
  }

  private def eligible(agg: HashAggregateExec): Boolean =
    agg.groupingExpressions.nonEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(ae =>
        ae.mode == Partial && !ae.isDistinct && ae.filter.isEmpty &&
          ae.aggregateFunction.isInstanceOf[DeclarativeAggregate]) &&
      coversOutput(agg)

  /** Per-task reduction estimate from the logical link's CBO stats:
    * rows-per-task ÷ per-task distinct keys (ndv capped at rows/task).
    * Missing stats → not low (rule stays off). */
  private def lowReduction(agg: HashAggregateExec): Boolean = {
    val maxRed = conf.getConfString(MaxReductionConf, "2.0").toDouble
    agg.logicalLink match {
      case Some(la: Aggregate) =>
        val stats = la.child.stats
        val rows = stats.rowCount.map(_.toDouble)
        val ndv = la.groupingExpressions.map {
          case a: Attribute =>
            stats.attributeStats.find(_._1.exprId == a.exprId)
              .flatMap(_._2.distinctCount).map(_.toDouble)
          case _ => None
        }
        if (rows.isEmpty || ndv.exists(_.isEmpty)) false
        else {
          val tasks = math.max(1, conf.numShufflePartitions).toDouble
          val rowsPerTask = rows.get / tasks
          // a multi-key ndv is upper-bounded by the product; an ndv
          // OVER-estimate UNDER-estimates reduction, erring toward
          // firing — acceptable: firing costs at most the forgone
          // (small) combine, not correctness
          val keyNdv = ndv.flatten.product
          val perTaskKeys = math.min(keyNdv, rowsPerTask)
          rowsPerTask / math.max(1.0, perTaskKeys) < maxRed
        }
      case _ => false
    }
  }

  /** Every output attribute must be either a grouping output or an
    * inputAggBuffer attribute we know how to synthesize. */
  private def coversOutput(agg: HashAggregateExec): Boolean = {
    val known = agg.groupingExpressions.map(_.toAttribute.exprId).toSet ++
      agg.aggregateExpressions.flatMap(
        _.aggregateFunction.inputAggBufferAttributes.map(_.exprId))
    agg.resultExpressions.forall {
      case a: Attribute => known.contains(a.exprId)
      case _ => false
    }
  }

  private def rewrite(agg: HashAggregateExec): SparkPlan = {
    // one-row buffer per declarative slot: update expressions with the
    // buffer attributes bound to their initial values
    val bufExpr: Map[Long, Expression] =
      agg.aggregateExpressions.flatMap { ae =>
        val af = ae.aggregateFunction.asInstanceOf[DeclarativeAggregate]
        val init = af.aggBufferAttributes.map(_.exprId)
          .zip(af.initialValues).toMap
        af.inputAggBufferAttributes.zip(af.updateExpressions).map {
          case (battr, upd) =>
            battr.exprId.id -> upd.transform {
              case a: AttributeReference if init.contains(a.exprId) =>
                init(a.exprId)
            }
        }
      }.toMap
    val groupBy = agg.groupingExpressions
      .map(g => g.toAttribute.exprId.id -> g).toMap
    val projList: Seq[NamedExpression] = agg.resultExpressions.map {
      case a: Attribute if bufExpr.contains(a.exprId.id) =>
        Alias(bufExpr(a.exprId.id), a.name)(exprId = a.exprId)
      case a: Attribute if groupBy.contains(a.exprId.id) =>
        // grouping NamedExpressions (attrs or aliases) already carry the
        // output exprId — project them directly
        groupBy(a.exprId.id)
      case other => other
    }
    ProjectExec(projList.toIndexedSeq, agg.child)
  }
}
