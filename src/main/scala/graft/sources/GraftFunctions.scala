package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 SCALAR FUNCTIONS backing the partition transforms (round 19 — the
  * Iceberg move): Spark resolves a write's
  * `RequiresDistributionAndOrdering` clustering of `days(ts)` /
  * `bucket(n, id)` by loading a function of the SAME NAME from the
  * table's catalog ([[GraftCatalog]] implements FunctionCatalog and
  * serves these), then hash-partitions the incoming rows by the
  * function's RESULT — so every row of one day/bucket lands in one task
  * and the writer opens one file per leaf. The implementations MUST
  * agree with the writer's own derivation ([[PartitionTransforms]]) or
  * clustering would be wrong silently; both sides call the same
  * arithmetic.
  *
  * Also user-callable (`SELECT graft.system.days(ts)`) — handy for
  * debugging which leaf a row lands in.
  */
private[sources] object GraftFunctions {

  val Names: Seq[String] = Seq("days", "bucket")

  def load(name: String): UnboundFunction = name match {
    case "days" => DaysUnbound
    case "bucket" => BucketUnbound
    case other => throw new NoSuchElementException(
      s"graft catalog: unknown function '$other' — available: " +
        Names.mkString(", "))
  }

  object DaysUnbound extends UnboundFunction {
    override def name(): String = "days"
    override def description(): String =
      "days(ts): the UTC epoch day of a timestamp/date — the hidden-" +
        "partition transform's derivation"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"days() takes one argument, got ${inputType.catalogString}")
      inputType.fields(0).dataType match {
        case TimestampType => new DaysMicros(TimestampType)
        case TimestampNTZType => new DaysMicros(TimestampNTZType)
        case DateType => DaysDate
        case other => throw new UnsupportedOperationException(
          s"days() needs a timestamp/date argument, got " +
            other.catalogString)
      }
    }
  }

  /** Epoch day of a timestamp's internal micros (UTC instant for
    * TIMESTAMP, literal calendar value for TIMESTAMP_NTZ — both truncate
    * with the same arithmetic).
    */
  class DaysMicros(argType: DataType)
      extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(argType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "days"
    override def canonicalName(): String = "graft.days"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0)) null
      else Int.box(
        PartitionTransforms.epochDayOfMicros(input.getLong(0)).toInt)
  }

  object DaysDate extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(DateType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "days"
    override def canonicalName(): String = "graft.days"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0)) null else Int.box(input.getInt(0))
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, v): a 64-bit avalanche hash of v, floorMod n — the " +
        "hidden-partition transform's derivation"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket() takes (numBuckets, value), got ${inputType.catalogString}")
      val nType = inputType.fields(0).dataType
      require(nType == IntegerType,
        s"bucket(): numBuckets must be INT, got ${nType.catalogString}")
      inputType.fields(1).dataType match {
        case LongType => new BucketFn(LongType)
        case IntegerType => new BucketFn(IntegerType)
        case StringType => new BucketFn(StringType)
        case other => throw new UnsupportedOperationException(
          s"bucket() needs an int/long/string value, got " +
            other.catalogString)
      }
    }
  }

  class BucketFn(valueType: DataType)
      extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, valueType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else {
        val n = input.getInt(0)
        Int.box(valueType match {
          case StringType => PartitionTransforms.bucketOfString(
            input.getUTF8String(1).toString, n)
          case IntegerType =>
            PartitionTransforms.bucketOfLong(input.getInt(1), n)
          case _ => PartitionTransforms.bucketOfLong(input.getLong(1), n)
        })
      }
  }
}
