package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Dsl._

/** throwaway component-cost measurements (not part of any surface) */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, sfDir, "lineitem")
    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-40s min=${ts.min}%.3fs  (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("count(*)") { noop(li.groupBy().count()) }
    time("sum(double)") { noop(li.agg(sum(col("l_extendedprice")))) }
    time("sum(dec(x)) one col") { noop(li.agg(sum(dec(col("l_extendedprice"))))) }
    time("4x sum(dec(x))") { noop(li.agg(
      sum(dec(col("l_extendedprice"))), sum(dec(col("l_quantity"))),
      sum(dec(col("l_discount"))), sum(dec(col("l_tax"))))) }
    time("sum(dec*frac product)") { noop(li.agg(
      sum(dec(col("l_extendedprice")) * (lit(1) - frac(col("l_discount"))).cast("decimal(7,6)")))) }
    time("sum(dec*frac*frac product)") { noop(li.agg(
      sum(dec(col("l_extendedprice")) * (lit(1) - frac(col("l_discount"))).cast("decimal(7,6)")
        * (lit(1) + frac(col("l_tax"))).cast("decimal(7,6)")))) }
    time("full q1 agg") { noop(ops.Aggs.q1(spark, sfDir)) }
    time("q1 agg repartitioned 32") {
      val df = li.repartition(32)
      noop(df.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        d4(sum(dec(col("l_quantity")))).as("sum_qty"),
        d4(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        d4(sum(dec(col("l_extendedprice")) * (lit(1) - frac(col("l_discount"))).cast("decimal(7,6)"))).as("sum_disc_price"),
        d4(sum(dec(col("l_extendedprice")) * (lit(1) - frac(col("l_discount"))).cast("decimal(7,6)")
          * (lit(1) + frac(col("l_tax"))).cast("decimal(7,6)"))).as("sum_charge"),
        d4(sum(dec(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))
    }
    spark.stop()
  }
}
