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

  val Names: Seq[String] =
    Seq("years", "months", "days", "hours", "bucket", "truncate")

  def load(name: String): UnboundFunction = name match {
    case "days" => new TimeUnitUnbound("days", DaysSpec("x"))
    case "months" => new TimeUnitUnbound("months", MonthsSpec("x"))
    case "years" => new TimeUnitUnbound("years", YearsSpec("x"))
    case "hours" => new TimeUnitUnbound("hours", HoursSpec("x"))
    case "bucket" => BucketUnbound
    case "truncate" => TruncateUnbound
    case other => throw new NoSuchElementException(
      s"graft catalog: unknown function '$other' — available: " +
        Names.mkString(", "))
  }

  /** One unbound per calendar unit (years/months/days/hours) — the
    * bound function computes [[PartitionTransforms.unitOfMicros]] of the
    * argument, the EXACT arithmetic the writer derives directories with.
    */
  class TimeUnitUnbound(fname: String, proto: PartSpec)
      extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(ts): the hidden-partition transform's unit ordinal"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$fname() takes one argument, got ${inputType.catalogString}")
      inputType.fields(0).dataType match {
        case TimestampType => new TimeUnitFn(fname, proto, TimestampType)
        case TimestampNTZType =>
          new TimeUnitFn(fname, proto, TimestampNTZType)
        case DateType if fname != "hours" =>
          new TimeUnitFn(fname, proto, DateType)
        case other => throw new UnsupportedOperationException(
          s"$fname() needs a timestamp${
            if (fname == "hours") "" else "/date"} argument, got " +
            other.catalogString)
      }
    }
  }

  class TimeUnitFn(fname: String, proto: PartSpec, argType: DataType)
      extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(argType)
    override def resultType(): DataType = IntegerType
    override def name(): String = fname
    override def canonicalName(): String = s"graft.$fname"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0)) null
      else {
        val micros =
          if (argType == DateType) input.getInt(0).toLong * 86400000000L
          else input.getLong(0)
        Int.box(PartitionTransforms.unitOfMicros(proto, micros).toInt)
      }
  }

  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, v): ints floor to a multiple of w, strings cut to " +
        "their first w chars — the transform's derivation"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate() takes (width, value), got ${inputType.catalogString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate(): width must be INT, got " +
          inputType.fields(0).dataType.catalogString)
      inputType.fields(1).dataType match {
        case LongType | IntegerType | StringType =>
          new TruncateFn(inputType.fields(1).dataType)
        case other => throw new UnsupportedOperationException(
          s"truncate() needs an int/long/string value, got " +
            other.catalogString)
      }
    }
  }

  class TruncateFn(valueType: DataType) extends ScalarFunction[AnyRef] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, valueType)
    override def resultType(): DataType = valueType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): AnyRef =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else {
        val w = input.getInt(0)
        valueType match {
          case StringType => org.apache.spark.unsafe.types.UTF8String
            .fromString(input.getUTF8String(1).toString.take(w))
          case IntegerType =>
            Int.box(PartitionTransforms.truncLong(input.getInt(1), w).toInt)
          case _ =>
            Long.box(PartitionTransforms.truncLong(input.getLong(1), w))
        }
      }
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
