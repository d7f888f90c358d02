package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k / set operations (SURVEY.md §2.2).
  *
  * Scale notes: global top-k compiles to TakeOrderedAndProject (per
  * partition heap + driver merge of k rows — no full sort); grouped
  * top-k is the row_number≤k pattern (one shuffle on the group key).
  */
object SortsSets extends Pack {

  def decls: Seq[Decl] = Seq(

    // Multi-key global sort, mixed directions, explicit null placement
    // on a column we null out with NULLIF.
    Decl("q_sort_global", (spark, dir) =>
      Tables(spark, dir, "orders")
        .withColumn("pri", nullif(col("o_orderpriority"), lit("3-MEDIUM")))
        .select(col("o_orderkey"), col("o_orderstatus"), col("pri"), col("o_totalprice"))
        .orderBy(col("o_orderstatus").desc_nulls_last, col("pri").asc_nulls_first,
          col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first),
      Some(
        """SELECT o_orderkey, o_orderstatus, NULLIF(o_orderpriority, '3-MEDIUM') AS pri, o_totalprice
          |FROM orders
          |ORDER BY o_orderstatus DESC NULLS LAST, pri ASC NULLS FIRST,
          |  o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST""".stripMargin)),

    Decl("q_limit", (spark, dir) =>
      Tables(spark, dir, "orders")
        .orderBy(col("o_orderkey").asc_nulls_first)
        .select(col("o_orderkey"), col("o_custkey"))
        .limit(20),
      Some(
        """SELECT o_orderkey, o_custkey FROM orders
          |ORDER BY o_orderkey ASC NULLS FIRST LIMIT 20""".stripMargin)),

    Decl("q_topk", (spark, dir) =>
      Tables(spark, dir, "orders")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10),
      Some(
        """SELECT o_orderkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
          |LIMIT 10""".stripMargin)),

    Decl("q_topk_group", (spark, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables(spark, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment").asc_nulls_first, col("rn").asc_nulls_first,
          col("c_custkey").asc_nulls_first, col("c_acctbal").asc_nulls_first)
    }, Some(
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer)
        |WHERE rn <= 3
        |ORDER BY c_mktsegment ASC NULLS FIRST, rn ASC NULLS FIRST,
        |  c_custkey ASC NULLS FIRST, c_acctbal ASC NULLS FIRST""".stripMargin)),

    Decl("q_set_unionall", (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val a = o.filter(col("o_totalprice") > 250000)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderstatus"))
      a.unionAll(b)
        .orderBy(col("o_orderkey").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }, Some(
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 250000
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin)),

    Decl("q_set_union", (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val a = o.filter(col("o_totalprice") > 250000)
        .select(col("o_orderstatus"), col("o_orderpriority"))
      val b = o.filter(col("o_orderstatus") === "P")
        .select(col("o_orderstatus"), col("o_orderpriority"))
      a.union(b).distinct()
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }, Some(
      """SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_totalprice > 250000
        |UNION
        |SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Decl("q_set_intersect", (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val u = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      f.intersect(u)
        .orderBy(col("o_custkey").asc_nulls_first)
    }, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin)),

    Decl("q_set_except", (spark, dir) => {
      val c = Tables(spark, dir, "customer").select(col("c_custkey"))
      val o = Tables(spark, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      c.except(o)
        .orderBy(col("c_custkey").asc_nulls_first)
    }, Some(
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin)),

    Decl("q_set_intersectall", (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val f = o.filter(col("o_orderstatus").isin("F", "P")).select(col("o_custkey"))
      val u = o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
      f.intersectAll(u)
        .orderBy(col("o_custkey").asc_nulls_first)
    }, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus IN ('F','P')
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin)),

    Decl("q_set_exceptall", (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val all = o.select(col("o_custkey"))
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      all.exceptAll(f)
        .orderBy(col("o_custkey").asc_nulls_first)
    }, Some(
      """SELECT o_custkey FROM orders
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin)),

    // Symmetric difference: members of exactly one of two sets —
    // (A∖B)∪(B∖A), spelled with the engine's set operators so each
    // side is a distinct-reduced anti-join, never a full outer join
    // over the union. Sets: BUILDING-segment customers vs customers
    // with acctbal > 5000 (overlapping, neither contains the other).
    Decl("q_set_symdiff", (spark, dir) => {
      val cust = Tables(spark, dir, "customer")
      val a = cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = cust.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      a.except(b).union(b.except(a))
        .orderBy(col("c_custkey").asc_nulls_first)
    }, Some(
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |SELECT c_custkey FROM (
        |  (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
        |  UNION ALL
        |  (SELECT c_custkey FROM b EXCEPT SELECT c_custkey FROM a))
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin)),
  )
}
