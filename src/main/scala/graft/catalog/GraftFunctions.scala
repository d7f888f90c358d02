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
  val names: Seq[String] = Seq("bucket", "days")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(new BucketUnbound)
    case "days" => Some(new DaysUnbound)
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
