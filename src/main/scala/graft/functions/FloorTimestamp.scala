package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Fixed-width timestamp truncation: floor the internal micros value to a
  * multiple of `unitMicros`. Timestamps are raw longs inside Tungsten, so
  * this codegens to two integer ops per row — versus `TruncTimestamp`'s
  * per-row timezone path. Exact for wallclock (NTZ) timestamps and for
  * UTC instants, for units that are fixed-width (≤ day); the optimizer
  * rule [[graft.plans.TruncToFloor]] only emits it under those
  * conditions. `floorMod` keeps pre-1970 values on the correct (earlier)
  * boundary. */
final case class FloorTimestamp(child: Expression, unitMicros: Long)
    extends UnaryExpression {

  require(unitMicros > 0, "unitMicros must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"floor_timestamp needs a timestamp input, got ${other.sql}")
  }

  override def dataType: DataType = child.dataType

  override def nullSafeEval(input: Any): Any = {
    val micros = input.asInstanceOf[Long]
    micros - java.lang.Math.floorMod(micros, unitMicros)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"($c - java.lang.Math.floorMod($c, ${unitMicros}L))")

  override def prettyName: String = "floor_timestamp"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
