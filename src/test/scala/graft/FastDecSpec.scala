package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType}
import graft.functions.FastDecKernel

/** FastCastDec must be BIT-IDENTICAL to `.cast("decimal(p,s)")` on
  * every double, not just the money-shaped fixtures — the DuckDB
  * oracle hashes depend on it. Fuzzes the kernel against the real
  * Cast over adversarial corpora, then checks the wired Dsl macros
  * end-to-end through a real aggregation.
  */
class FastDecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sparkCast(d: Double, p: Int, s: Int, mode: String): Any = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, EvalMode}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val c = Cast(BoundReference(0, DoubleType, nullable = false),
      DecimalType(p, s), None, EvalMode.withName(mode))
    val row = new GenericInternalRow(1); row.update(0, d)
    try c.eval(row)
    catch { case e: Throwable => s"THROWN:${e.getClass.getSimpleName}" }
  }

  private def fastCast(d: Double, p: Int, s: Int, mode: String): Any = {
    val k = new FastDecKernel(p, s, mode, DoubleType)
    try k.castDouble(d)
    catch { case e: Throwable => s"THROWN:${e.getClass.getSimpleName}" }
  }

  private def check(d: Double, p: Int, s: Int, mode: String): Unit = {
    val want = sparkCast(d, p, s, mode)
    val got = fastCast(d, p, s, mode)
    assert(got == want,
      s"FastDec mismatch for d=$d (bits=${java.lang.Double.doubleToRawLongBits(d)}) " +
        s"decimal($p,$s) mode=$mode: fast=$got spark=$want")
  }

  private val shapes = Seq((18, 6), (8, 6), (18, 4), (10, 2), (18, 0))
  private val modes = Seq("LEGACY", "ANSI", "TRY")

  test("special values match the real cast in every eval mode") {
    val specials = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, -Double.MaxValue, 1e-300, 1e300, 4.9e-324,
      1e9, -1e9, 1e9 + 1, 9.99e8, 1e10, 1.0, -1.0, 0.5, -0.5)
    for ((p, s) <- shapes; m <- modes; d <- specials) check(d, p, s, m)
  }

  test("money-shaped and half-boundary values match") {
    val crafted = scala.collection.mutable.ArrayBuffer[Double]()
    // 2-decimal money values
    var i = 0
    while (i < 20000) { crafted += i * 0.01; crafted += -(i * 0.01); i += 1 }
    // exact scale-6 half boundaries and their neighbours (the fallback zone)
    var k = 0L
    while (k < 4000) {
      val b = (k * 2 + 1) * 5e-7
      crafted += b
      crafted += java.lang.Math.nextUp(b)
      crafted += java.lang.Math.nextDown(b)
      crafted += -b
      k += 97
    }
    // boundaries at larger magnitudes
    for (mag <- Seq(1e0, 1e3, 1e6, 1e8); j <- 0 to 50) {
      val b = mag + j * 1e-6 + 5e-7
      crafted += b; crafted += java.lang.Math.nextUp(b); crafted += java.lang.Math.nextDown(b)
    }
    for ((p, s) <- shapes; d <- crafted) { check(d, p, s, "LEGACY"); check(d, p, s, "ANSI") }
  }

  test("uniform random doubles across the full exponent range match") {
    val rnd = new java.util.Random(0xfa57dec)
    var i = 0
    while (i < 200000) {
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN) { check(d, 18, 6, "LEGACY"); check(d, 8, 6, "ANSI") }
      i += 1
    }
    // and dense in the money range
    i = 0
    while (i < 200000) {
      val d = (rnd.nextDouble() - 0.5) * 2e6
      check(d, 18, 6, "LEGACY"); check(d, 8, 6, "LEGACY")
      i += 1
    }
  }

  test("FastDecMul matches the real Multiply on random and adversarial decimals") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Multiply, NumericEvalContext, EvalMode}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import graft.functions.FastDecMulKernel
    val rnd = new java.util.Random(0xdecd01)
    val shapes = Seq((18, 6, 7, 6), (18, 6, 18, 6), (8, 6, 8, 6), (18, 6, 8, 6), (10, 2, 12, 4))
    for ((p1, s1, p2, s2) <- shapes; mode <- Seq("LEGACY", "ANSI")) {
      val lt = DecimalType(p1, s1); val rt = DecimalType(p2, s2)
      val k = new FastDecMulKernel(lt, rt, mode, allowPrecisionLoss = true)
      val real = Multiply(BoundReference(0, lt, nullable = false),
        BoundReference(1, rt, nullable = false),
        NumericEvalContext(EvalMode.withName(mode), true))
      assert(k.resultType == real.dataType, s"type mismatch $lt x $rt")
      def randDec(p: Int, s: Int): Decimal = {
        val digits = 1 + rnd.nextInt(p)
        var u = 0L; var i = 0
        while (i < digits) { u = u * 10 + rnd.nextInt(10); i += 1 }
        if (rnd.nextBoolean()) u = -u
        Decimal(u, p, s)
      }
      var i = 0
      while (i < 20000) {
        val a = randDec(p1, s1); val b = randDec(p2, s2)
        val row = new GenericInternalRow(2); row.update(0, a); row.update(1, b)
        val want = real.eval(row)
        val got = k.mul(a, b)
        assert(got == want, s"mul mismatch $a x $b ($lt x $rt, $mode): fast=$got real=$want")
        i += 1
      }
      // long-overflow products must take the exact slow path
      def maxFor(p: Int): Long = { var m = 1L; (1 to p).foreach(_ => m *= 10); m - 1 }
      val big = Decimal(maxFor(p1), p1, s1)
      val big2 = Decimal(maxFor(p2), p2, s2)
      val row = new GenericInternalRow(2); row.update(0, big); row.update(1, big2)
      assert(k.mul(big, big2) == real.eval(row))
      val z = Decimal(0L, p2, s2)
      row.update(1, z)
      assert(k.mul(big, z) == real.eval(row))
    }
  }

  test("Dsl.dec/frac through a real aggregation equal the plain-cast spelling") {
    val li = Tables(spark, TestSpark.sf, "lineitem")
    val fast = li.agg(
      sum(Dsl.dec(col("l_extendedprice"))).as("a"),
      sum(Dsl.dec(col("l_extendedprice")) *
        (lit(1) - Dsl.frac(col("l_discount"))).cast("decimal(7,6)")).as("b"))
      .collect().head
    val slow = li.agg(
      sum(col("l_extendedprice").cast("decimal(18,6)")).as("a"),
      sum(col("l_extendedprice").cast("decimal(18,6)") *
        (lit(1) - col("l_discount").cast("decimal(8,6)")).cast("decimal(7,6)")).as("b"))
      .collect().head
    assert(fast == slow, s"agg mismatch: $fast vs $slow")
    // null propagation
    val n = spark.sql("SELECT CAST(NULL AS DOUBLE) AS x")
    assert(n.select(Dsl.dec(col("x"))).collect().head.isNullAt(0))
  }
}
