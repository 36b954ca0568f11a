package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal,
  RuntimeReplaceable, TruncDate, TruncTimestamp, UnaryExpression}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Type-polymorphic date/time truncation for the Snowflake surface:
  * `TRUNC(x, part)` / `DATE_TRUNC(part, x)` preserve the input's type
  * (DATE in → DATE out, TIMESTAMP in → truncated TIMESTAMP out —
  * Snowflake's documented behavior; the reference transpiles the query
  * through sqlglot and executes on DuckDB,
  * `universql/warehouse/duckdb.py:156,189`, whose `date_trunc` is
  * equally polymorphic, so it inherits the same type preservation for
  * free).
  *
  * Spark's built-ins split the semantics across two functions with
  * type-destroying edges (ADVICE r13 #1):
  *   - `trunc(x, fmt)` only supports the YEAR/QUARTER/MONTH/WEEK family —
  *     `trunc(d, 'DAY')` silently returns NULL — and always demotes a
  *     TIMESTAMP argument to DATE;
  *   - `date_trunc(fmt, x)` supports every part but always promotes a
  *     DATE argument to TIMESTAMP.
  * The dispatch needs the ARGUMENT TYPE, which only exists after
  * analysis, so this is a [[RuntimeReplaceable]] (same pattern as
  * [[VariantToJson]]): the analyzer resolves the child, then the
  * optimizer swaps in
  *   - DATE + year/quarter/month/week → Spark `trunc` (stays DATE)
  *   - DATE + day-or-finer           → identity (truncating a date to a
  *     sub-day boundary is the date itself)
  *   - TIMESTAMP                     → Spark `date_trunc`
  *   - TIMESTAMP_NTZ                 → `date_trunc` through a UTC-PINNED
  *     cast pair (TruncTimestamp's input contract is TIMESTAMP). UTC on
  *     both casts and the trunc treats the NTZ micros as wall-clock for
  *     every part: a session-zone sandwich would be a wall-clock
  *     identity except for instants inside a DST gap of a non-UTC
  *     session zone, where the round trip shifts the value (ADVICE r14
  *     #3) — UTC has no gaps, so the identity is unconditional.
  *     [[graft.plans.TruncToFloor]] matches through this exact cast
  *     pair so `date_trunc` grouping keys keep feeding the NDV-gated
  *     columnar aggregate.
  *   - anything else (string dates…) → cast to TIMESTAMP, `date_trunc`
  * NANOSECOND maps to MICROSECOND: Spark timestamps are µs-precision, so
  * ns-truncation is the identity there (and Spark's `date_trunc` would
  * return NULL for the unknown unit).
  *
  * The rewriter only constructs this with a canonical-part string
  * literal ([[graft.engine.SnowflakeRewriter.normalizeDatePart]]), so
  * `part` is a plain String, not a child expression.
  */
case class SnowTrunc(child: Expression, part: String)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = {
    val canon = part.toLowerCase match {
      case "nanosecond" => "microsecond"
      case p => p
    }
    val partLit = Literal(UTF8String.fromString(canon), StringType)
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    def dtrunc(ts: Expression) = TruncTimestamp(partLit, ts, tz)
    child.dataType match {
      case NullType => Literal(null, NullType)
      case DateType => canon match {
        case "year" | "quarter" | "month" | "week" => TruncDate(child, partLit)
        case _ => child
      }
      case TimestampType => dtrunc(child)
      case TimestampNTZType =>
        val utc = Some("UTC")
        Cast(TruncTimestamp(partLit, Cast(child, TimestampType, utc), utc),
          TimestampNTZType, utc)
      case _ => dtrunc(Cast(child, TimestampType, tz))
    }
  }

  override def prettyName: String = "graft_trunc"

  override protected def withNewChildInternal(
      newChild: Expression): SnowTrunc = copy(child = newChild)
}
