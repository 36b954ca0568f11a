package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression,
  GreaterThanOrEqual, If, IsNull, Literal, Or, RuntimeReplaceable,
  InheritAnalysisRules, UnaryMinus, With}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Single-evaluation lowerings for Snowflake functions whose previous
  * token-level rewrites spliced an argument's SQL text 2-3× into the
  * output (round-13 VERDICT #2 / next-round #5): with an expensive or
  * NONDETERMINISTIC operand the work ran per splice — and for DIV0 a
  * nondeterministic divisor could pass the zero guard with one draw and
  * divide by a fresh zero with the next.
  *
  * Each function binds the shared operand exactly once through
  * Catalyst's [[With]] (a `CommonExpressionDef` + refs — the same
  * mechanism Spark's own `nullif`/`try_add` use), so the optimizer's
  * RewriteWithExpression guarantees one evaluation per row. All are
  * [[RuntimeReplaceable]] with [[InheritAnalysisRules]]: the replacement
  * is the analyzed child, so name resolution and type coercion apply to
  * it exactly as they would to hand-written SQL — inner calls are
  * therefore plain [[UnresolvedFunction]]s over the bound refs.
  */
object SingleEval {

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args, isDistinct = false)

  /** DIV0(a, b): a/b but 0 when b = 0 (and, for DIV0NULL, when b IS
    * NULL). try_divide in the else keeps overflow/edge parity with the
    * previous lowering. b is bound once: guard and divide see the SAME
    * value. */
  def div0(a: Expression, b: Expression, nullAsZero: Boolean): Expression =
    With(b) { case Seq(bRef) =>
      val isZero =
        org.apache.spark.sql.catalyst.expressions.EqualTo(bRef, Literal(0))
      val cond = if (nullAsZero) Or(isZero, IsNull(bRef)) else isZero
      If(cond, Literal(0), fn("try_divide", a, bRef))
    }

  /** Numeric TRUNC/TRUNCATE toward zero (Spark has no function for it):
    * floor for positives, ceil for negatives. x bound once (was spliced
    * 3×). For a LITERAL scale in [-18, 18] the factor is an exact Long
    * so decimal inputs stay in exact decimal arithmetic — TRUNC(0.29, 2)
    * must be 0.29, but in doubles 0.29 * power(10, 2) is 28.999… and
    * floors to 0.28 (same contract as the previous token lowering). */
  def numTrunc(x: Expression, scale: Option[Expression]): Expression = {
    def truncToZero(r: Expression): Expression =
      If(GreaterThanOrEqual(r, Literal(0)), fn("floor", r), fn("ceil", r))
    scale match {
      case None => With(x) { case Seq(r) => truncToZero(r) }
      case Some(n) => litInt(n) match {
        case Some(k) if k >= 0 && k <= 18 =>
          val p = Literal(java.math.BigInteger.TEN.pow(k.toInt).longValueExact())
          With(x) { case Seq(r) =>
            fn("/", truncToZero(fn("*", r, p)), p) }
        case Some(k) if k < 0 && k >= -18 =>
          val p = Literal(java.math.BigInteger.TEN.pow(-k.toInt).longValueExact())
          With(x) { case Seq(r) =>
            fn("*", truncToZero(fn("/", r, p)), p) }
        case _ =>
          // non-literal scale: double power() fallback (scale
          // expressions are vanishingly rare). The factor CANNOT be a
          // With def: CommonExpressionDef.dataType is queried during
          // analysis before an UnresolvedFunction def resolves
          // (UnresolvedException) — so the scale renders twice (it is a
          // scale: trivially cheap) while x still binds once.
          def f() = fn("power", Literal(10.0d), Cast(n, DoubleType))
          With(x) { case Seq(r) =>
            fn("/", truncToZero(fn("*", r, f())), f()) }
      }
    }
  }

  /** SPLIT_PART with Snowflake's part-0-means-part-1 rule (Spark's
    * split_part throws on 0); the part expression is bound once. */
  def splitPart(s: Expression, d: Expression, p: Expression): Expression =
    With(p) { case Seq(pRef) =>
      fn("split_part", s, d,
        If(org.apache.spark.sql.catalyst.expressions.EqualTo(pRef, Literal(0)),
          Literal(1), pRef))
    }

  /** DATEDIFF boundary count for the two parts whose lowering needs each
    * argument twice (quarter/month ordinal diffs); both ends bound once.
    * Matches dateDiffBoundary's rendered arithmetic exactly. */
  def dateDiffOrdinal(unit: String, a: Expression, b: Expression): Expression =
    With(a, b) { case Seq(ar, br) =>
      val years = fn("-", fn("year", br), fn("year", ar))
      val sub = unit match {
        case "quarter" =>
          fn("+", fn("*", years, Literal(4)),
            fn("-", fn("quarter", br), fn("quarter", ar)))
        case "month" =>
          fn("+", fn("*", years, Literal(12)),
            fn("-", fn("month", br), fn("month", ar)))
        case other => throw new IllegalArgumentException(
          s"dateDiffOrdinal supports quarter/month, got $other")
      }
      Cast(sub, LongType)
    }

  private def litInt(e: Expression): Option[Long] = e match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Byte, _) => Some(v.toLong)
    case Literal(d: org.apache.spark.sql.types.Decimal, t: DecimalType)
        if t.scale == 0 => Some(d.toLong)
    case UnaryMinus(ch, _) => litInt(ch).map(-_)
    case _ => None
  }
}

/** The registry shim: createOrReplaceTempFunction needs a named
  * Expression node; this wraps the [[With]]-built replacement with the
  * original args as `parameters` for error messages. */
case class SingleEvalFn(name: String, parameters: Seq[Expression],
    replacement: Expression)
    extends Expression with RuntimeReplaceable with InheritAnalysisRules {
  override def prettyName: String = name
  override protected def withNewChildInternal(
      newChild: Expression): SingleEvalFn = copy(replacement = newChild)
}
