package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial check that min/max file skipping NEVER changes results:
  * every predicate in the grid must return identical aggregates from
  * the (pruned) catalog scan and the raw parquet source. Covers the
  * double / string (incl. >64-char truncated bounds) / timestamp-ntz
  * bound encodings, AND/OR/NOT/IN composition, and both partitioned
  * and unpartitioned layouts.
  */
class PruningFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mkTable(name: String, src: DataFrame, partition: String): String = {
    val wh = s"/tmp/graft_test_fuzz_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set(s"spark.sql.catalog.fz$name", "graft.catalog.RelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.fz$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE fz$name.f")
    val ddlCols = src.schema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
    val part = if (partition.isEmpty) "" else s" PARTITIONED BY ($partition)"
    spark.sql(s"CREATE TABLE fz$name.f.t ($ddlCols)$part")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      src.createOrReplaceTempView(s"fuzz_src_$name")
      // three inserts → several files with disjoint-ish bounds
      spark.sql(s"INSERT INTO fz$name.f.t SELECT * FROM fuzz_src_$name WHERE l_orderkey % 3 = 0")
      spark.sql(s"INSERT INTO fz$name.f.t SELECT * FROM fuzz_src_$name WHERE l_orderkey % 3 = 1")
      spark.sql(s"INSERT INTO fz$name.f.t SELECT * FROM fuzz_src_$name WHERE l_orderkey % 3 = 2")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    s"fz$name.f.t"
  }

  private def checkAll(table: String, raw: DataFrame, preds: Seq[(String, Column)]): Unit = {
    val cat = spark.table(table)
    preds.foreach { case (desc, p) =>
      val a = cat.filter(p).agg(count(lit(1)), sum(col("l_orderkey"))).collect()(0)
      val b = raw.filter(p).agg(count(lit(1)), sum(col("l_orderkey"))).collect()(0)
      assert(a == b, s"pruning changed result for [$desc]: catalog=$a raw=$b")
    }
  }

  test("pruning-safety fuzz on lineitem-shaped table (flat + partitioned)") {
    val src = Tables(spark, TestSpark.sf, "lineitem")
      // a >64-char string column exercises the truncated-bound path
      .withColumn("longstr", concat_ws("-", col("l_returnflag"),
        lpad(col("l_orderkey").cast("string"), 80, "x")))
      // a nullable column exercises null-count-based pruning
      .withColumn("nstr",
        when(col("l_orderkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("l_linestatus")))
    val preds: Seq[(String, Column)] = Seq(
      "qty>30" -> (col("l_quantity") > 30),
      "qty<=10" -> (col("l_quantity") <= 10),
      "price between" -> col("l_extendedprice").between(20000, 60000),
      "flag=A" -> (col("l_returnflag") === "A"),
      "flag in" -> col("l_returnflag").isin("N", "R"),
      "flag != A and qty>45" -> (col("l_returnflag") =!= "A" && col("l_quantity") > 45),
      "ship > 1999" -> (col("l_shipdate") > lit("1999-01-01").cast("timestamp_ntz")),
      "ship <= 1996" -> (col("l_shipdate") <= lit("1996-06-15").cast("timestamp_ntz")),
      "key in small set" -> col("l_orderkey").isin(1L, 7L, 500L, 99999L),
      "or mix" -> (col("l_quantity") < 2 || col("l_extendedprice") > 90000),
      "not" -> !(col("l_returnflag") === "N"),
      "longstr prefix range" -> (col("longstr") >= "N" && col("longstr") < "O"),
      "longstr eq miss" -> (col("longstr") === "zzz-none"),
      "startswith hit" -> col("l_returnflag").startsWith("A"),
      "startswith miss" -> col("longstr").startsWith("zzz"),
      "longstr startswith truncated" -> col("longstr").startsWith("R-xx"),
      "is null" -> col("nstr").isNull,
      "is not null" -> col("nstr").isNotNull,
      "null-safe eq" -> (col("nstr") <=> "F"),
      "null-safe eq null" -> col("nstr").isNull,
      "impossible" -> (col("l_quantity") > 1e9),
      "tautology" -> (col("l_orderkey") >= 0))
    val flat = mkTable("flat", src, "")
    checkAll(flat, src, preds)
    val parted = mkTable("part", src, "l_returnflag")
    checkAll(parted, src, preds)
  }

  test("pruning-safety on timestamp-ntz partitioned-by-days events table") {
    val src = Tables(spark, TestSpark.sf, "events")
      .withColumnRenamed("event_id", "l_orderkey") // reuse the checker
    val wh = "/tmp/graft_test_fuzz_ev"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set("spark.sql.catalog.fzev", "graft.catalog.RelativeCatalog")
    spark.conf.set("spark.sql.catalog.fzev.warehouse", wh)
    spark.sql("CREATE NAMESPACE fzev.f")
    spark.sql("CREATE TABLE fzev.f.ev (l_orderkey BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING) PARTITIONED BY (days(ts))")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      src.createOrReplaceTempView("fuzz_ev_src")
      spark.sql("INSERT INTO fzev.f.ev SELECT * FROM fuzz_ev_src")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val preds: Seq[(String, Column)] = Seq(
      "ts day range" -> (col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-12 00:00:00").cast("timestamp_ntz")),
      "ts after end" -> (col("ts") > lit("2031-01-01 00:00:00").cast("timestamp_ntz")),
      "ts micro boundary" -> (col("ts") <= lit("2024-01-05 12:34:56.789012").cast("timestamp_ntz")),
      "type+value" -> (col("event_type") === "purchase" && col("value") > 100.0))
    checkAll("fzev.f.ev", src, preds)
  }
}
