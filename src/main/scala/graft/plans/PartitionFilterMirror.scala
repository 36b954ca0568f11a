package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: automatic Iceberg partition pruning for plain SQL.
  *
  * [[graft.sources.IcebergLite]] writes hidden partitions as shadow
  * STRING partition columns (`__part_<col>` for identity,
  * `__part_<transform>__<col>` for Iceberg's temporal transforms
  * year/month/day/hour) while keeping `<col>` itself inside the data
  * files. A user query filters on the REAL column
  * (`WHERE o_orderpriority = '1-URGENT'`, `WHERE ts >= '1995-03-01'`)
  * and knows nothing about the shadow — this rule mirrors conjuncts on a
  * source column onto its shadow partition column, which Spark's
  * `FileSourceStrategy` then uses to skip non-matching files entirely
  * (no footer reads, no tasks).
  *
  * Identity mirrors: the shadow value is exactly `CAST(col AS STRING)`,
  * so `=`/`IN` mirror for unambiguous string types, and `>=`/`>`/`<`/
  * `<=` (and BETWEEN, already split into conjuncts) mirror for DateType
  * only — ISO `yyyy-MM-dd` is fixed-width zero-padded, so lexicographic
  * order equals date order. INTEGRAL identity partitions are written
  * with the `zi` encoding instead (`__part_zi__<col>` = value + 2^63,
  * zero-padded to 20 digits — an order-isomorphism from signed 64-bit
  * to string order), so `=`/`IN` AND all range predicates mirror with
  * exact strictness; the naive rendering's "9" > "10" trap is gone.
  *
  * Temporal-transform mirrors (the 100 TB time-partitioned-fact shape):
  * the shadow is a zero-padded UTC-wallclock prefix string of the value
  * (`yyyy[-MM[-dd[-HH]]]`), which is MONOTONE NON-DECREASING in the
  * source value. Hence `col = lit → shadow = tf(lit)`,
  * `col ≥/> lit → shadow ≥ tf(lit)` and `col ≤/< lit → shadow ≤ tf(lit)`
  * (strict source bounds weaken to inclusive shadow bounds — the
  * literal's own bucket can still hold matches). Applied for DateType
  * and TIMESTAMP_NTZ literals always; for TIMESTAMP (instant) literals
  * only under a UTC session zone, where the write-side `date_format`
  * agrees with the UTC rendering used here. Literals outside years
  * 0-9999 are skipped (ISO adds a sign prefix there and string order
  * breaks; year-10000+ data under a range predicate is the documented
  * unsupported corner, beyond Iceberg practice).
  *
  * Correct by construction in every mirrored case: the mirror only
  * removes files whose recorded partition value cannot contain matching
  * rows; the original predicate always remains.
  */
object PartitionFilterMirror extends Rule[LogicalPlan] {

  private val Prefix = "__part_"
  private val ShadowName = "__part_(?:(year|month|day|hour|zi)__)?(.+)".r

  private def identityMirrorable(dt: DataType): Boolean = dt match {
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

  /** The `zi` encoding's rendering of an integral literal: value biased
    * by 2^63, zero-padded to 20 digits — the write side's exact string,
    * an order-isomorphism from signed 64-bit to lexicographic order, so
    * range mirrors keep their strictness. */
  private def ziString(l: Literal): Option[Literal] = {
    val bi: Option[BigInt] = (l.dataType, l.value) match {
      case (_, null) => None
      case (ByteType, b: Byte) => Some(BigInt(b.toLong))
      case (ShortType, s: Short) => Some(BigInt(s.toLong))
      case (IntegerType, i: Int) => Some(BigInt(i.toLong))
      case (LongType, lo: Long) => Some(BigInt(lo))
      case _ => None
    }
    bi.map { v =>
      val digits = (v + BigInt(2).pow(63)).toString
      Literal(UTF8String.fromString(
        "0" * (20 - digits.length) + digits), StringType)
    }
  }

  private def utcSession: Boolean = {
    val z = conf.sessionLocalTimeZone
    z == "UTC" || z == "Etc/UTC" || z == "GMT" || z == "Z" || z == "+00:00"
  }

  private def microsToLdt(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  /** The transform's string rendering of a DATE/TIMESTAMP[_NTZ] literal;
    * None when the type/zone/year combination can't be rendered safely. */
  private def temporalString(tf: String, l: Literal): Option[Literal] = {
    val ldt: Option[java.time.LocalDateTime] = (l.dataType, l.value) match {
      case (_, null) => None
      case (DateType, d: Int) =>
        Some(java.time.LocalDate.ofEpochDay(d.toLong).atStartOfDay)
      case (TimestampNTZType, us: Long) => Some(microsToLdt(us))
      case (TimestampType, us: Long) if utcSession => Some(microsToLdt(us))
      case _ => None
    }
    ldt.filter(d => d.getYear >= 0 && d.getYear <= 9999).map { d =>
      val s = tf match {
        case "year" => f"${d.getYear}%04d"
        case "month" => f"${d.getYear}%04d-${d.getMonthValue}%02d"
        case "day" =>
          f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"
        case "hour" =>
          f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d-${d.getHour}%02d"
      }
      Literal(UTF8String.fromString(s), StringType)
    }
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: LogicalRelation)
        if r.output.exists(_.name.startsWith(Prefix)) =>
      // source column name → (transform, shadow attribute)
      val shadowInfo: Map[String, (String, Attribute)] = r.output.flatMap { a =>
        a.name match {
          case ShadowName(tf, src) =>
            Some(src.toLowerCase -> (Option(tf).getOrElse("identity"), a))
          case _ => None
        }
      }.toMap
      val conjuncts = splitConj(cond)

      def infoOf(a: AttributeReference): Option[(String, Attribute)] =
        shadowInfo.get(a.name.toLowerCase)

      // identity mirrors
      def eqMirror(a: AttributeReference, l: Literal): Option[Expression] =
        infoOf(a).flatMap {
          case ("identity", s) if identityMirrorable(a.dataType) =>
            stringForm(l).map(EqualTo(s, _))
          case ("zi", s) => ziString(l).map(EqualTo(s, _))
          case (tf, s) => temporalString(tf, l).map(EqualTo(s, _))
        }
      def inMirror(a: AttributeReference, ls: Seq[Expression]): Option[Expression] =
        infoOf(a).flatMap {
          case ("identity", s) if identityMirrorable(a.dataType) =>
            val sls = ls.map(l => stringForm(l.asInstanceOf[Literal]))
            if (sls.forall(_.isDefined)) Some(In(s, sls.flatten)) else None
          case ("zi", s) =>
            val sls = ls.map(l => ziString(l.asInstanceOf[Literal]))
            if (sls.forall(_.isDefined)) Some(In(s, sls.flatten)) else None
          case (tf, s) =>
            val sls = ls.map(l => temporalString(tf, l.asInstanceOf[Literal]))
            if (sls.forall(_.isDefined)) Some(In(s, sls.flatten)) else None
        }
      // range mirrors: identity DateType keeps the comparison's
      // strictness (ISO string order is exact, so the boundary partition
      // can be skipped); temporal transforms weaken strict bounds to
      // inclusive (the literal's own bucket may still hold matches)
      def rangeMirror(a: AttributeReference, l: Literal,
          lower: Boolean, strict: Boolean): Option[Expression] =
        infoOf(a).flatMap {
          case ("identity", s) =>
            if (a.dataType != DateType || l.dataType != DateType ||
                l.value == null) None
            else {
              val year = java.time.LocalDate
                .ofEpochDay(l.value.asInstanceOf[Int].toLong).getYear
              if (year < 0 || year > 9999) None
              else stringForm(l).map(sl => (lower, strict) match {
                case (true, true) => GreaterThan(s, sl)
                case (true, false) => GreaterThanOrEqual(s, sl)
                case (false, true) => LessThan(s, sl)
                case (false, false) => LessThanOrEqual(s, sl)
              })
            }
          // zi is an exact order-isomorphism (like ISO dates), so the
          // boundary partition is skippable under strict bounds too
          case ("zi", s) => ziString(l).map(sl => (lower, strict) match {
            case (true, true) => GreaterThan(s, sl)
            case (true, false) => GreaterThanOrEqual(s, sl)
            case (false, true) => LessThan(s, sl)
            case (false, false) => LessThanOrEqual(s, sl)
          })
          case (tf, s) => temporalString(tf, l).map(sl =>
            if (lower) GreaterThanOrEqual(s, sl) else LessThanOrEqual(s, sl))
        }

      val mirrors = conjuncts.flatMap {
        case EqualTo(a: AttributeReference, l: Literal) => eqMirror(a, l)
        case EqualTo(l: Literal, a: AttributeReference) => eqMirror(a, l)
        case In(a: AttributeReference, ls)
            if ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
          inMirror(a, ls)
        case GreaterThan(a: AttributeReference, l: Literal) =>
          rangeMirror(a, l, lower = true, strict = true)
        case GreaterThan(l: Literal, a: AttributeReference) =>
          rangeMirror(a, l, lower = false, strict = true)
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
          rangeMirror(a, l, lower = true, strict = false)
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
          rangeMirror(a, l, lower = false, strict = false)
        case LessThan(a: AttributeReference, l: Literal) =>
          rangeMirror(a, l, lower = false, strict = true)
        case LessThan(l: Literal, a: AttributeReference) =>
          rangeMirror(a, l, lower = true, strict = true)
        case LessThanOrEqual(a: AttributeReference, l: Literal) =>
          rangeMirror(a, l, lower = false, strict = false)
        case LessThanOrEqual(l: Literal, a: AttributeReference) =>
          rangeMirror(a, l, lower = true, strict = false)
        case _ => None
      }
      val fresh = mirrors.filterNot(m => conjuncts.exists(_.semanticEquals(m)))
      if (fresh.isEmpty) f
      else Filter((conjuncts ++ fresh).reduce(And), r)
  }
}
