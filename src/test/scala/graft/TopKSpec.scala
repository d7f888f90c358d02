package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopK.perGroup must return exactly the rows of the naive one-window
  * top-k whenever the ordering is total — the contract every ANN op
  * relies on when it swaps the skew-prone single window out.
  */
class TopKSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("two-phase top-k equals the single-window top-k on a skewed multi-partition input") {
    import spark.implicits._
    // 3 groups, deliberately skewed (one group holds ~90% of rows),
    // spread over many input partitions; deterministic total order.
    val rows = (0 until 3000).map { i =>
      val g = if (i % 10 == 0) i % 3 else 0
      (g, i.toLong, (i * 2654435761L % 997).toInt)
    }
    val df = spark.createDataset(rows).toDF("g", "id", "score")
      .repartition(16)

    val naive = {
      val w = Window.partitionBy(col("g"))
        .orderBy(col("score").desc, col("id").asc)
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 7)
    }
    val phased = ops.TopK.perGroup(df, Seq(col("g")),
      Seq(col("score").desc, col("id").asc), 7, "rk")

    val a = naive.select("g", "rk", "id", "score").collect().map(_.toSeq).toSet
    val b = phased.select("g", "rk", "id", "score").collect().map(_.toSeq).toSet
    assert(a == b, s"two-phase diverged: missing=${a.diff(b)} extra=${b.diff(a)}")
    assert(a.size == 21)
  }
}
