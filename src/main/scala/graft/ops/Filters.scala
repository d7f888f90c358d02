package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.functions._

/** Filters / predicates (SURVEY.md §2.2). All predicates are expressed
  * declaratively so Catalyst pushes them into the parquet scan
  * (`PushedFilters` visible in .explain).
  */
object Filters extends Pack {
  def decls: Seq[Decl] = Seq(
    Decl("q_filter_cmp", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(col("l_quantity") >= 30 && col("l_discount") < 0.05 &&
          col("l_returnflag") =!= "A" && col("l_shipdate") > to_timestamp(lit("1996-01-01")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
          col("l_quantity").asc_nulls_first, col("l_returnflag").asc_nulls_first),
      Some(
        """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
          |FROM lineitem
          |WHERE l_quantity >= 30 AND l_discount < 0.05
          |  AND l_returnflag <> 'A' AND l_shipdate > TIMESTAMP '1996-01-01'
          |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
          |  l_quantity ASC NULLS FIRST, l_returnflag ASC NULLS FIRST""".stripMargin)),

    Decl("q_filter_bool", (spark, dir) =>
      Tables(spark, dir, "orders")
        .filter((col("o_orderstatus") === "F" || col("o_totalprice") > 150000) &&
          !(col("o_orderpriority") === "1-URGENT"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey").asc_nulls_first, col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some(
        """SELECT o_orderkey, o_orderstatus, o_orderpriority
          |FROM orders
          |WHERE (o_orderstatus = 'F' OR o_totalprice > 150000)
          |  AND NOT (o_orderpriority = '1-URGENT')
          |ORDER BY o_orderkey ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST,
          |  o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Decl("q_filter_in", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(10, 20))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
        .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
          col("l_returnflag").asc_nulls_first, col("l_quantity").asc_nulls_first),
      Some(
        """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
          |FROM lineitem
          |WHERE l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 20
          |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
          |  l_returnflag ASC NULLS FIRST, l_quantity ASC NULLS FIRST""".stripMargin)),

    // The corpus has no null cells; make some with NULLIF so the
    // null predicates actually select a nontrivial subset.
    Decl("q_filter_null", (spark, dir) =>
      Tables(spark, dir, "orders")
        .withColumn("st", nullif(col("o_orderstatus"), lit("O")))
        .filter(col("st").isNotNull || col("st") <=> lit(null))
        .filter(col("st").isNull || col("st") === "F")
        .select(col("o_orderkey"), col("st"))
        .orderBy(col("o_orderkey").asc_nulls_first, col("st").asc_nulls_first),
      Some(
        """SELECT o_orderkey, st FROM (
          |  SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st FROM orders)
          |WHERE (st IS NOT NULL OR st IS NOT DISTINCT FROM NULL)
          |  AND (st IS NULL OR st = 'F')
          |ORDER BY o_orderkey ASC NULLS FIRST, st ASC NULLS FIRST""".stripMargin)),

    Decl("q_filter_like", (spark, dir) =>
      Tables(spark, dir, "part")
        .filter(col("p_name").like("%widget") || col("p_type").rlike("^ST.*ARD$"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey").asc_nulls_first, col("p_name").asc_nulls_first,
          col("p_type").asc_nulls_first),
      Some(
        """SELECT p_partkey, p_name, p_type
          |FROM part
          |WHERE p_name LIKE '%widget' OR regexp_matches(p_type, '^ST.*ARD$')
          |ORDER BY p_partkey ASC NULLS FIRST, p_name ASC NULLS FIRST,
          |  p_type ASC NULLS FIRST""".stripMargin)),
  )
}
