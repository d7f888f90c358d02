package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[ops.Aggs.exactPercentileViaCumCount]] must be BIT-IDENTICAL to
  * the native `percentile(v, p)` aggregate on every distribution — the
  * DuckDB oracle hashes depend on it. Fuzzes grouped multisets with
  * heavy ties, negatives, huge/tiny magnitudes and adversarial
  * percentiles (including ones landing exactly on and just beside
  * integral positions) against the native aggregate, comparing raw
  * double BITS before any rounding.
  */
class PercentileCumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def compare(rows: Seq[(String, Double)], p: Double): Unit = {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.map(r => Row(r._1, r._2)).asJavaList),
      schema)
    val native = df.groupBy(col("g"))
      .agg(expr(s"percentile(v, $p)").as("pct"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val cnts = df.groupBy(col("g").as("rf"), col("v")).agg(count(lit(1)).as("c"))
    val mine = ops.Aggs.exactPercentileViaCumCount(
        cnts, col("rf"), col("v"), col("c"), p)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mine.keySet == native.keySet, s"group sets differ at p=$p")
    for ((g, want) <- native) {
      val got = mine(g)
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(want),
        s"percentile mismatch g=$g p=$p: cum=$got native=$want " +
          s"(bits ${java.lang.Double.doubleToRawLongBits(got)} vs " +
          s"${java.lang.Double.doubleToRawLongBits(want)})")
    }
  }

  private implicit class SeqOps[T](s: Seq[T]) {
    def asJavaList: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add)
      l
    }
  }

  test("fuzz: grouped random multisets match native percentile bit-for-bit") {
    val rnd = new scala.util.Random(20220819L)
    for (round <- 1 to 30) {
      val nGroups = 1 + rnd.nextInt(4)
      val rows = (0 until nGroups).flatMap { gi =>
        val n = 1 + rnd.nextInt(200)
        // tie-heavy pool: a small value vocabulary forces duplicate
        // values (frequency > 1), the cum-count path's hard case
        // no -0.0 in the pool: the count-frame groupBy normalizes it to
        // 0.0 (native percentile keeps both as distinct map keys), a
        // ±0.0-bits-only divergence the declared query's d4 decimal
        // cast absorbs — pinned by the dedicated -0.0 test below
        val vocab = Array.fill(1 + rnd.nextInt(20))(rnd.nextInt(6) match {
          case 0 => rnd.nextInt(10).toDouble
          case 1 => -(1 + rnd.nextInt(9)).toDouble
          case 2 => rnd.nextDouble()
          case 3 => rnd.nextDouble() * 1e12
          case 4 => -rnd.nextDouble() * 1e-9
          case _ => rnd.nextGaussian() * 1e4
        })
        (0 until n).map(_ => (s"g$gi", vocab(rnd.nextInt(vocab.length))))
      }
      val p = rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => 1.0
        case 2 => 0.5
        case 3 => rnd.nextDouble()
        // lands exactly on an integral position for some N
        case _ => rnd.nextInt(10) / 10.0
      }
      compare(rows, p)
    }
  }

  test("edge: single value, all-equal group, two values straddling") {
    compare(Seq(("a", 42.0)), 0.9)
    compare(Seq.fill(17)(("a", 7.5)), 0.3)
    compare(Seq(("a", 1.0), ("a", 2.0)), 0.5)
    compare(Seq(("a", 1.0), ("a", 2.0)), 0.0)
    compare(Seq(("a", 1.0), ("a", 2.0)), 1.0)
    // positions exactly on the tie boundary
    compare((1 to 10).map(i => ("a", if (i <= 5) 1.0 else 2.0)), 0.5)
    compare((1 to 10).map(i => ("a", if (i <= 5) 1.0 else 2.0)), 4.0 / 9.0)
  }

  test("-0.0: value identical after the query's decimal normalization") {
    // native percentile keys -0.0 and 0.0 separately and can return
    // the -0.0 bit pattern; the cum-count path sees them pre-merged by
    // the count groupBy (knownfloatingpointnormalized) and returns
    // +0.0. Numerically equal, and the declared query's
    // d4(round(·, 4)) decimal cast maps both to the same bits — the
    // only observable surface. Assert exactly that.
    val rows = Seq(("a", -0.0), ("a", -0.0), ("a", 0.0), ("a", 1.0))
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.map(r => Row(r._1, r._2)).asJavaList),
      schema)
    def d4bits(c: org.apache.spark.sql.Column) =
      round(c, 4).cast("decimal(18,4)").cast("double")
    for (p <- Seq(0.0, 0.25, 1.0 / 3.0, 0.5, 0.9)) {
      val native = df.groupBy(col("g"))
        .agg(d4bits(expr(s"percentile(v, $p)")).as("pct"))
        .collect().head.getDouble(1)
      val cnts = df.groupBy(col("g").as("rf"), col("v")).agg(count(lit(1)).as("c"))
      val mine = ops.Aggs.exactPercentileViaCumCount(
          cnts, col("rf"), col("v"), col("c"), p)
        .select(d4bits(col("pct"))).collect().head.getDouble(0)
      assert(java.lang.Double.doubleToRawLongBits(mine) ==
        java.lang.Double.doubleToRawLongBits(native),
        s"post-d4 -0.0 divergence at p=$p: cum=$mine native=$native")
    }
  }
}
