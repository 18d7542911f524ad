package graft.core

import org.apache.spark.sql.types._

/** Bidirectional Spark ⇄ ClickHouse-ish type-name mapping.
  *
  * Reference `type_mapping` at `/root/reference/backend/main.py:250-256`:
  * int64→Int64, float64→Float64, bool→UInt8, datetime64→DateTime,
  * object→String (fallback `.get(…, 'String')`). `DESCRIBE TABLE` returns the
  * names unparsed (main.py:141-147), so the forward direction only needs to
  * render names the reference's clients would recognize.
  */
object Types {

  /** Spark type → ClickHouse-ish type name (forward: DESCRIBE parity). */
  def toExternalName(dt: DataType): String = dt match {
    case LongType      => "Int64"
    case IntegerType   => "Int32"
    case ShortType     => "Int16"
    case ByteType      => "Int8"
    case DoubleType    => "Float64"
    case FloatType     => "Float32"
    case BooleanType   => "UInt8"
    case TimestampType    => "DateTime"
    case TimestampNTZType => "DateTime"
    case DateType         => "Date"
    case StringType    => "String"
    case BinaryType    => "String"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(e, _) => s"Array(${toExternalName(e)})"
    case _             => "String"
  }

  /** External type name → Spark type (reverse: DDL from a described schema). */
  def fromExternalName(name: String): DataType = name.trim match {
    case "Int64" | "UInt64" => LongType
    case "Int32" | "UInt32" => IntegerType
    case "Int16" | "UInt16" => ShortType
    case "Int8"             => ByteType
    case "UInt8"            => BooleanType
    case "Float64"          => DoubleType
    case "Float32"          => FloatType
    case "DateTime"         => TimestampType
    case "Date"             => DateType
    case _                  => StringType
  }
}
