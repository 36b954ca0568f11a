package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal,
  RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.StructsToJson
import org.apache.spark.sql.types._

/** Type-dispatched `TO_JSON` for the Snowflake surface.
  *
  * This engine represents VARIANT as JSON text (`PARSE_JSON(x)` is the
  * identity over a JSON string — reference behavior:
  * `universql/protocol/utils.py` variant columns arrive as JSON text),
  * so `TO_JSON` over a variant-text value is also the identity. But over
  * a struct/array/map — an `OBJECT_CONSTRUCT`/`ARRAY_CONSTRUCT` result,
  * whether written inline, named through a CTE/subquery alias, or stored
  * as a nested parquet column — it must genuinely serialize or a raw
  * struct leaks into the result set (found by SemiWindowFuzzSpec; the
  * first, token-shape fix only caught the inline-constructor case —
  * ADVICE r10 #2).
  *
  * The dispatch needs the ARGUMENT TYPE, which only exists after
  * analysis, so this is a [[RuntimeReplaceable]]: the analyzer resolves
  * the child, then the optimizer swaps in the replacement —
  *   - string        → identity (variant-as-JSON-text convention)
  *   - struct/array/map → Spark's native `to_json`
  *   - null literal  → null string
  *   - other scalars → cast to string (JSON scalar rendering; matches
  *     Snowflake's implicit to_variant for numbers/booleans)
  *
  * KNOWN AMBIGUITY (inherent to variant-as-text, round-11 ADVICE): a
  * plain VARCHAR argument is indistinguishable from a string-typed
  * variant here, so `TO_JSON(varchar_col)` returns the text as-is,
  * where Snowflake (implicitly casting VARCHAR → VARIANT) would return
  * the QUOTED/escaped JSON string (`TO_JSON('a') = '"a"'`). Variant
  * columns — `col:path` extractions, PARSE_JSON results, OBJECT/ARRAY
  * constructs — behave identically to the reference; only a
  * syntactically-plain string column/literal diverges, and quoting
  * those at the rewriter would break the (far more common) variant
  * round-trip `TO_JSON(PARSE_JSON(s))`. Documented as the
  * representation's contract rather than special-cased.
  */
case class VariantToJson(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case _: StringType => child
    case _: StructType | _: ArrayType | _: MapType =>
      // timeZoneId must be supplied here: ResolveTimeZone only walks the
      // analyzed tree, not a lazily-built replacement
      StructsToJson(Map.empty, child, Some(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    case NullType => Literal(null, StringType)
    case _ => Cast(child, StringType)
  }

  override def prettyName: String = "graft_to_json"

  override protected def withNewChildInternal(
      newChild: Expression): VariantToJson = copy(child = newChild)
}
