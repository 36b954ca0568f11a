package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: automatic Iceberg partition pruning for plain SQL.
  *
  * [[graft.sources.IcebergLite]] writes hidden identity partitions as
  * `__part_<col>=<string-of-value>` directories while keeping `<col>`
  * itself inside the data files, and reads them back with `basePath` so
  * the shadow column is a STRING partition column of the relation. A user
  * query filters on the REAL column (`WHERE o_orderpriority = '1-URGENT'`)
  * and knows nothing about the shadow — this rule mirrors every
  * equality/IN conjunct on a source column onto its shadow partition
  * column, which Spark's `FileSourceStrategy` then uses to skip
  * non-matching files entirely (no footer reads, no tasks).
  *
  * Correct by construction: the shadow value is exactly
  * `CAST(col AS STRING)` of the row's value (type inference is disabled on
  * the read, so the directory string round-trips untouched), and the
  * mirror literal is the same cast of the filter literal — `col = lit`
  * implies `shadow = string(lit)`, so the mirror only removes files that
  * cannot contain matches. The original predicate always remains. Types
  * whose string form is ambiguous (floating point, decimals, timestamps)
  * are not mirrored.
  */
object PartitionFilterMirror extends Rule[LogicalPlan] {

  private val Prefix = "__part_"

  private def mirrorable(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         DateType | BooleanType => true
    case _ => false
  }

  private def stringForm(l: Literal): Option[Literal] =
    if (l.value == null) None
    else Some(Literal(UTF8String.fromString(l.value match {
      case d: Int if l.dataType == DateType =>
        java.time.LocalDate.ofEpochDay(d.toLong).toString
      case v => v.toString
    }), StringType))

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: LogicalRelation)
        if r.output.exists(_.name.startsWith(Prefix)) =>
      val shadows = r.output.collect {
        case a if a.name.startsWith(Prefix) => a.name -> a
      }.toMap
      val conjuncts = splitConj(cond)

      def shadowOf(a: AttributeReference) =
        if (mirrorable(a.dataType)) shadows.get(Prefix + a.name) else None

      val mirrors = conjuncts.flatMap {
        case EqualTo(a: AttributeReference, l: Literal) =>
          for (s <- shadowOf(a); sl <- stringForm(l)) yield EqualTo(s, sl)
        case EqualTo(l: Literal, a: AttributeReference) =>
          for (s <- shadowOf(a); sl <- stringForm(l)) yield EqualTo(s, sl)
        case In(a: AttributeReference, ls)
            if ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
          val sls = ls.map(l => stringForm(l.asInstanceOf[Literal]))
          for (s <- shadowOf(a); if sls.forall(_.isDefined))
            yield In(s, sls.flatten)
        case _ => None
      }
      val fresh = mirrors.filterNot(m => conjuncts.exists(_.semanticEquals(m)))
      if (fresh.isEmpty) f
      else Filter((conjuncts ++ fresh).reduce(And), r)
  }
}
