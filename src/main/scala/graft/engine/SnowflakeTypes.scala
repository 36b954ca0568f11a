package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types._

/** Spark schema → Snowflake wire-schema decoration (A23).
  *
  * The reference re-types every DuckDB Arrow result to Snowflake's wire
  * schema with per-column metadata (`logicalType`, precision, scale, …)
  * (`universql/protocol/utils.py:137-249`, surfaced as `rowtype` at
  * `universql/protocol/snowflake.py:158-179`). This is the Spark-side
  * equivalent: a `rowtype` description per column plus a wire-normalizing
  * projection (complex types → JSON text, matching
  * `universql/protocol/utils.py:231-240` where lists go out as JSON).
  */
object SnowflakeTypes {

  final case class ColumnMeta(
      name: String,
      logicalType: String,
      precision: Option[Int],
      scale: Option[Int],
      nullable: Boolean)

  def logicalType(dt: DataType): (String, Option[Int], Option[Int]) = dt match {
    case ByteType | ShortType | IntegerType | LongType => ("FIXED", Some(38), Some(0))
    case d: DecimalType       => ("FIXED", Some(d.precision), Some(d.scale))
    case FloatType | DoubleType => ("REAL", None, None)
    case StringType            => ("TEXT", None, None)
    case BinaryType            => ("BINARY", None, None)
    case BooleanType           => ("BOOLEAN", None, None)
    case DateType              => ("DATE", None, None)
    case TimestampNTZType      => ("TIMESTAMP_NTZ", None, None)
    case TimestampType         => ("TIMESTAMP_LTZ", None, None)
    case _: ArrayType          => ("ARRAY", None, None)
    case _: StructType | _: MapType => ("OBJECT", None, None)
    case other                 => ("TEXT", None, None)
  }

  def rowType(df: DataFrame): Seq[ColumnMeta] =
    df.schema.fields.toIndexedSeq.map { f =>
      val (lt, p, s) = logicalType(f.dataType)
      ColumnMeta(f.name, lt, p, s, f.nullable)
    }

  /** Full wire payload: Snowflake's `rowsetBase64` — a base64 Arrow IPC
    * stream of the (wire-normalized) result, plus rowtype metadata
    * (parity with `universql/protocol/snowflake.py:223-243`). */
  def toRowsetBase64(df: DataFrame): (String, Seq[ColumnMeta]) = {
    val wire = toWire(df)
    val bytes = org.apache.spark.sql.GraftArrow.toArrowIpcStream(wire)
    (java.util.Base64.getEncoder.encodeToString(bytes), rowType(wire))
  }

  /** Normalize a result for the wire: ARRAY/STRUCT/MAP columns become JSON
    * text (the reference serializes semi-structured results as JSON
    * strings tagged ARRAY/OBJECT). */
  def toWire(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType =>
          to_json(col(s"`${f.name}`")).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
