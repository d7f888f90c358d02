package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The format's partition transforms as catalog FUNCTIONS (the analog
  * of the iceberg-spark-runtime system functions the reference enables
  * via pom.xml:22-26): `bucket(n, col)` and `days(col)`, loadable from
  * the catalog's FunctionCatalog surface. Spark resolves these when a
  * V2 write declares a clustered distribution on a non-identity
  * transform (DistributionAndOrderingUtils), and users can call them
  * directly — `SELECT cat.bucket(16, x)` — to inspect row→partition
  * routing. Definitions match [[Writer.specTransformExprs]]:
  * bucket = pmod(murmur3_32(col, seed 42), n), days = days since epoch
  * (UTC sessions; `datediff(cast(ts AS DATE), '1970-01-01')` agrees).
  */
object GraftFunctions {
  val names: Seq[String] = Seq("bucket", "days", "years", "months", "hours", "truncate")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(new BucketUnbound)
    case "days" => Some(new DaysUnbound)
    case "years" => Some(new TimePartUnbound("years"))
    case "months" => Some(new TimePartUnbound("months"))
    case "hours" => Some(new HoursUnbound)
    case "truncate" => Some(new TruncateUnbound)
    case _ => None
  }

  /** The 32-bit bucket hash shared by the SQL function, the write-side
    * fanout key, and `Writer.specTransformExprs`' `pmod(hash(col), n)`
    * (Spark's `hash()` = 32-bit murmur3, seed 42). */
  def bucketOf(value: Any, dt: DataType, n: Int): Int = {
    val h = if (value == null) 42 else Murmur3HashFunction.hash(value, dt, 42L).toInt
    val m = h % n
    if (m < 0) m + n else m
  }

  /** Epoch-day of a date/timestamp value (UTC). */
  def daysOf(value: Any, dt: DataType): java.lang.Long = dt match {
    case _: DateType => java.lang.Long.valueOf(value.asInstanceOf[Int].toLong)
    case _ => java.lang.Long.valueOf(
      Math.floorDiv(value.asInstanceOf[Long], 86400000000L)) // µs/day
  }

  private def toLocalDate(value: Any, dt: DataType): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(daysOf(value, dt))

  /** Years since 1970 (UTC) — `Writer.specTransformExprs`' `year(c)-1970`. */
  def yearsOf(value: Any, dt: DataType): Integer =
    Integer.valueOf(toLocalDate(value, dt).getYear - 1970)

  /** Months since 1970-01 (UTC). */
  def monthsOf(value: Any, dt: DataType): Integer = {
    val d = toLocalDate(value, dt)
    Integer.valueOf((d.getYear - 1970) * 12 + d.getMonthValue - 1)
  }

  /** Epoch-hour (UTC); dates land on their midnight hour. */
  def hoursOf(value: Any, dt: DataType): java.lang.Long = dt match {
    case _: DateType => java.lang.Long.valueOf(value.asInstanceOf[Int].toLong * 24L)
    case _ => java.lang.Long.valueOf(
      Math.floorDiv(value.asInstanceOf[Long], 3600000000L)) // µs/hour
  }

  /** Iceberg truncate: ints/longs floor to a multiple of `w` (floor
    * semantics for negatives, matching `c - pmod(c, w)`); strings keep
    * their first `w` characters. */
  def truncateOf(value: Any, dt: DataType, w: Int): AnyRef = value match {
    case null => null
    case i: java.lang.Integer => Integer.valueOf(i - Math.floorMod(i, w))
    case l: java.lang.Long => java.lang.Long.valueOf(l - Math.floorMod(l, w.toLong))
    case s: org.apache.spark.unsafe.types.UTF8String => s.substringSQL(1, w)
    case other => throw new IllegalArgumentException(
      s"truncate does not support ${other.getClass} ($dt)")
  }
}

class BucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) - the format's bucket transform: pmod(murmur3(col), n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2 &&
      inputType.fields(0).dataType.isInstanceOf[IntegerType],
      s"bucket expects (INT n, col), got $inputType")
    val dt = inputType.fields(1).dataType
    new ScalarFunction[Int] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket($dt)"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Int = {
        val n = input.getInt(0)
        GraftFunctions.bucketOf(
          if (input.isNullAt(1)) null else input.get(1, dt), dt, n)
      }
    }
  }
}

class DaysUnbound extends UnboundFunction {
  override def name(): String = "days"
  override def description(): String =
    "days(col) - the format's days transform: days since epoch (UTC)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 && (inputType.fields(0).dataType match {
      case _: DateType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }), s"days expects one date/timestamp column, got $inputType")
    val dt = inputType.fields(0).dataType
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] = Array(dt)
      override def resultType(): DataType = LongType
      override def name(): String = "days"
      override def canonicalName(): String = s"graft.days($dt)"
      override def produceResult(input: InternalRow): java.lang.Long =
        if (input.isNullAt(0)) null else GraftFunctions.daysOf(input.get(0, dt), dt)
    }
  }
}

/** years(col) / months(col): whole periods since epoch (UTC). */
class TimePartUnbound(part: String) extends UnboundFunction {
  override def name(): String = part
  override def description(): String =
    s"$part(col) - the format's $part transform: whole $part since 1970 (UTC)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 && (inputType.fields(0).dataType match {
      case _: DateType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }), s"$part expects one date/timestamp column, got $inputType")
    val dt = inputType.fields(0).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = part
      override def canonicalName(): String = s"graft.$part($dt)"
      override def produceResult(input: InternalRow): Integer =
        if (input.isNullAt(0)) null
        else if (part == "years") GraftFunctions.yearsOf(input.get(0, dt), dt)
        else GraftFunctions.monthsOf(input.get(0, dt), dt)
    }
  }
}

class HoursUnbound extends UnboundFunction {
  override def name(): String = "hours"
  override def description(): String =
    "hours(col) - the format's hours transform: epoch-hour (UTC)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 && (inputType.fields(0).dataType match {
      case _: DateType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }), s"hours expects one date/timestamp column, got $inputType")
    val dt = inputType.fields(0).dataType
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] = Array(dt)
      override def resultType(): DataType = LongType
      override def name(): String = "hours"
      override def canonicalName(): String = s"graft.hours($dt)"
      override def produceResult(input: InternalRow): java.lang.Long =
        if (input.isNullAt(0)) null else GraftFunctions.hoursOf(input.get(0, dt), dt)
    }
  }
}

/** truncate(w, col): floor ints/longs to multiples of w, prefix strings. */
class TruncateUnbound extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w, col) - the format's truncate transform: floor to width w / first w chars"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2 &&
      inputType.fields(0).dataType.isInstanceOf[IntegerType] &&
      (inputType.fields(1).dataType match {
        case _: IntegerType | _: LongType | _: StringType => true
        case _ => false
      }), s"truncate expects (INT w, int/long/string col), got $inputType")
    val dt = inputType.fields(1).dataType
    new ScalarFunction[AnyRef] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = dt
      override def name(): String = "truncate"
      override def canonicalName(): String = s"graft.truncate($dt)"
      override def produceResult(input: InternalRow): AnyRef =
        if (input.isNullAt(1)) null
        else GraftFunctions.truncateOf(input.get(1, dt), dt, input.getInt(0))
    }
  }
}
