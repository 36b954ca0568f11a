package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
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
  *
  * RANGE predicates (`>=`/`>`/`<`/`<=`, and BETWEEN, which Catalyst has
  * already split into two conjuncts) are mirrored for DateType only: ISO
  * `yyyy-MM-dd` strings are fixed-width zero-padded, so lexicographic
  * order equals date order — the dominant pruning shape at 100 TB
  * (`WHERE o_orderdate >= '1995-01-01'` touches only in-range partition
  * directories, no footer reads). Integer types are deliberately NOT
  * range-mirrored: their string forms ("9" > "10") don't sort
  * numerically. Guard rails: literals outside years 0-9999 are skipped
  * (ISO adds a sign prefix there and ordering breaks); data values with
  * negative years still compare below any in-range literal, matching
  * date order, while year-10000+ data under a range predicate is the one
  * unsupported corner (documented, beyond Iceberg practice).
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

      // date ranges: ISO strings sort like dates within years 0-9999
      def range(a: AttributeReference, l: Literal,
          mk: (Expression, Expression) => Expression): Option[Expression] =
        if (a.dataType != DateType || l.dataType != DateType ||
            l.value == null) None
        else {
          val year = java.time.LocalDate
            .ofEpochDay(l.value.asInstanceOf[Int].toLong).getYear
          if (year < 0 || year > 9999) None
          else for (s <- shadowOf(a); sl <- stringForm(l)) yield mk(s, sl)
        }

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
        case GreaterThan(a: AttributeReference, l: Literal) =>
          range(a, l, GreaterThan)
        case GreaterThan(l: Literal, a: AttributeReference) =>
          range(a, l, (s, v) => LessThan(s, v))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
          range(a, l, GreaterThanOrEqual)
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
          range(a, l, (s, v) => LessThanOrEqual(s, v))
        case LessThan(a: AttributeReference, l: Literal) =>
          range(a, l, LessThan)
        case LessThan(l: Literal, a: AttributeReference) =>
          range(a, l, (s, v) => GreaterThan(s, v))
        case LessThanOrEqual(a: AttributeReference, l: Literal) =>
          range(a, l, LessThanOrEqual)
        case LessThanOrEqual(l: Literal, a: AttributeReference) =>
          range(a, l, (s, v) => GreaterThanOrEqual(s, v))
        case _ => None
      }
      val fresh = mirrors.filterNot(m => conjuncts.exists(_.semanticEquals(m)))
      if (fresh.isEmpty) f
      else Filter((conjuncts ++ fresh).reduce(And), r)
  }
}
