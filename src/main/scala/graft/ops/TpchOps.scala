package graft.ops

import graft.{Decl, Pack, Tables}
import graft.Dsl.{d4, dec, frac}
import org.apache.spark.sql.functions._

/** Composite analytic queries in the classic TPC-H shapes (Q3 / Q5 /
  * Q10 analogs over the driver's TPC-H-ish tables): multi-join +
  * filtered date ranges + money aggregation + top-k, end-to-end. The
  * atomic operator inventory proves each piece; these prove the pieces
  * COMPOSE — the plans Catalyst should produce (dimension broadcasts,
  * pushed date filters, one fact shuffle per aggregation,
  * TakeOrderedAndProject heads) are pinned in PlanShapeSpec.
  *
  * Revenue arithmetic follows the flagship q1 exact-decimal shape so
  * both engines sum identically regardless of order.
  */
object TpchOps extends Pack {

  // Dsl.mul: bit-identical to `*` (FastDecSpec), long-multiply fast path
  private def revenue = graft.Dsl.mul(dec(col("l_extendedprice")),
    (lit(1) - frac(col("l_discount"))).cast("decimal(7,6)"))

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,6)) * " +
      "CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(7,6))"

  def decls: Seq[Decl] = Seq(

    // Q3 shape — shipping-priority: top-10 open orders of one market
    // segment by outstanding revenue. customer is a broadcast dim;
    // orders⋈lineitem is the one fact shuffle; the head is bounded.
    Decl("q_tpch_q3", (spark, dir) => {
      val cust = Tables(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") < expr("TIMESTAMP '1998-03-15 00:00:00'"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") > expr("TIMESTAMP '1998-03-15 00:00:00'"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(d4(sum(revenue)).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"), col("o_orderdate"), col("revenue"))
    }, Some(
      s"""SELECT l_orderkey, o_orderdate,
         |  D4(SUM($revenueSql)) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)),

    // Q6 shape — forecast revenue change: one filtered scan, one
    // global exact-decimal sum. All three predicates push to parquet
    // (row-group stats + dictionary), so the scan reads only matching
    // row groups; discount bounds compare as exact decimals to dodge
    // double-literal edge rounding.
    Decl("q_tpch_q6", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'") &&
          frac(col("l_discount")).between(
            expr("CAST(0.05 AS DECIMAL(8,6))"), expr("CAST(0.07 AS DECIMAL(8,6))")) &&
          col("l_quantity") < 24)
        .agg(d4(sum(graft.Dsl.mul(dec(col("l_extendedprice")), frac(col("l_discount")))))
          .as("revenue"),
          count(lit(1)).as("n_items")),
      Some(
        """SELECT
          |  D4(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
          |         CAST(l_discount AS DECIMAL(8,6)))) AS revenue,
          |  COUNT(*) AS n_items
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          |  AND CAST(l_discount AS DECIMAL(8,6))
          |    BETWEEN CAST(0.05 AS DECIMAL(8,6)) AND CAST(0.07 AS DECIMAL(8,6))
          |  AND l_quantity < 24""".stripMargin)),

    // Q5 shape — local-supplier volume: revenue per nation where the
    // supplier and customer share the nation, one year, one region.
    // nation/region/supplier/customer all broadcast; lineitem⋈orders
    // is the only fact-sized join.
    Decl("q_tpch_q5", (spark, dir) => {
      val nat = Tables(spark, dir, "nation")
        .join(broadcast(Tables(spark, dir, "region")
          .filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
        .select(col("o_orderkey"), col("o_custkey"))
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(d4(sum(revenue)).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }, Some(
      s"""SELECT n_name, D4(SUM($revenueSql)) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name ASC""".stripMargin)),

    // Q14 shape — promotion revenue share: one fact⋈dim join (part
    // broadcasts), conditional revenue in the numerator, exact decimal
    // division rounded at 4dp. The promo share is a ratio of two
    // exact decimal sums so neither engine accumulates float drift.
    Decl("q_tpch_q14", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1996-02-01 00:00:00'"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(Tables(spark, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          d4(sum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0).cast("decimal(18,6)")))).as("promo_revenue"),
          d4(sum(revenue)).as("total_revenue"),
          round(sum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0).cast("decimal(18,6)"))) * 100 / sum(revenue), 4)
            .cast("double").as("promo_pct"))
    }, Some(
      s"""SELECT
         |  D4(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql
         |           ELSE CAST(0 AS DECIMAL(18,6)) END)) AS promo_revenue,
         |  D4(SUM($revenueSql)) AS total_revenue,
         |  CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql
         |           ELSE CAST(0 AS DECIMAL(18,6)) END) * 100
         |    / SUM($revenueSql), 4) AS DOUBLE) AS promo_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""".stripMargin)),

    // Q18 shape — large-volume orders: orders whose total quantity
    // clears a HAVING threshold, joined back to their customer. The
    // qualifying-order set is tiny (the point of the filter) so it
    // broadcasts into the enrichment joins; the only fact-sized work
    // is the first lineitem aggregation.
    Decl("q_tpch_q18", (spark, dir) => {
      val big = Tables(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(d4(sum(dec(col("l_quantity")))).as("total_qty"))
        .filter(col("total_qty") > 85.0)
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      ord.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables(spark, dir, "customer")
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), d4(col("o_totalprice")).as("o_totalprice"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(20)
    }, Some(
      """WITH big AS (
        |  SELECT l_orderkey,
        |    D4(SUM(CAST(l_quantity AS DECIMAL(18,6)))) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING D4(SUM(CAST(l_quantity AS DECIMAL(18,6)))) > 85.0)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  D4(o_totalprice) AS o_totalprice, total_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey ASC LIMIT 20""".stripMargin)),

    // Q10 shape — returned-item revenue: top-20 customers by revenue
    // lost to returns in one quarter. The r-flag + date filters push
    // to the scans; customer⋈nation broadcast onto the aggregated
    // fact.
    Decl("q_tpch_q10", (spark, dir) => {
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP '1996-04-01 00:00:00'"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val cust = Tables(spark, dir, "customer")
        .join(broadcast(Tables(spark, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(d4(sum(revenue)).as("revenue"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
          d4(col("c_acctbal")).as("c_acctbal"), col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }, Some(
      s"""WITH rev AS (
         |  SELECT o_custkey, D4(SUM($revenueSql)) AS revenue
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY o_custkey)
         |SELECT c_custkey, c_name, D4(c_acctbal) AS c_acctbal, n_name, revenue
         |FROM rev
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin)),

    // Q12 shape — shipping-priority audit: per line status, how many
    // late-shipped lines belong to urgent vs non-urgent orders
    // (fixture has no l_shipmode/l_receiptdate; l_linestatus stands in
    // for the mode axis and "shipped after the order quarter closes"
    // for lateness). lineitem is the fact scan with the date filter
    // pushed; orders projects two columns and joins on the order key —
    // one fact shuffle, integer-exact CASE counts.
    Decl("q_tpch_q12", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
        .select(col("l_orderkey"), col("l_linestatus"))
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus").asc_nulls_first)
    }, Some(
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Q19 shape — discounted revenue under a DISJUNCTION of brand ×
    // size × quantity band predicates. The point is the plan: the OR
    // of ANDs must not block pushdown — Catalyst extracts the common
    // p_size/p_brand domain into the broadcast dim scan, the quantity
    // bands evaluate post-join, and no shuffle exists at all (part is
    // a broadcast dim). Exact-decimal revenue.
    Decl("q_tpch_q19", (spark, dir) => {
      val part = Tables(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(d4(sum(revenue)).as("revenue"), count(lit(1)).as("n_lines"))
    }, Some(
      s"""SELECT D4(SUM($revenueSql)) AS revenue, COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // Q22 shape — dormant high-balance accounts: customers whose
    // balance beats the mean positive balance and who placed no order
    // in the final trading year (every fixture customer has SOME
    // order, so classic "never ordered" is degenerate — the recency
    // cutoff keeps the anti-join live). The scalar mean is one tiny
    // agg broadcast into the filter; the dormancy test is a LEFT ANTI
    // join against the recent-buyer key set (date filter pushed to the
    // orders scan, distinct-reduced BEFORE the join so the anti build
    // side is keys, not the fact); grouped by nation bucket.
    Decl("q_tpch_q22", (spark, dir) => {
      val cust = Tables(spark, dir, "customer")
      // above-average test by cross-multiplication (bal·n > Σbal), not
      // division: Spark's AVG(DECIMAL) is exact while DuckDB's returns
      // DOUBLE, and this comparison is a FILTER boundary — a balance
      // within double-rounding distance of the mean would flip set
      // membership, changing counts, not just a display decimal
      // the mean is a SCALAR SUBQUERY, not a 1-row cross join: Spark
      // runs it as its own stage and inlines the result as a literal
      // into the filter (MergeScalarSubqueries collapses the SUM and
      // COUNT probes into one aggregate), so the plan has no
      // nested-loop node at all — the shape the sweep test pins
      cust.createOrReplaceTempView("q22_cust")
      Tables(spark, dir, "orders").createOrReplaceTempView("q22_orders")
      spark.sql(
        """SELECT CAST(c_nationkey % 5 AS INT) AS cntry_bucket,
          |  COUNT(*) AS n_cust,
          |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS total_bal
          |FROM q22_cust
          |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
          |    (SELECT COUNT(*) FROM q22_cust WHERE c_acctbal > 0.0)
          |  > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) FROM q22_cust
          |     WHERE c_acctbal > 0.0)
          |  AND NOT EXISTS (SELECT 1 FROM q22_orders WHERE o_custkey = c_custkey
          |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
          |GROUP BY cntry_bucket
          |ORDER BY cntry_bucket ASC NULLS FIRST""".stripMargin)
    }, Some(
      """WITH a AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS sum_bal,
        |           COUNT(*) AS n_pos
        |           FROM customer WHERE c_acctbal > 0.0)
        |SELECT CAST(c_nationkey % 5 AS INT) AS cntry_bucket,
        |  COUNT(*) AS n_cust,
        |  D4(SUM(CAST(c_acctbal AS DECIMAL(18,6)))) AS total_bal
        |FROM customer, a
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) * n_pos > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY cntry_bucket
        |ORDER BY cntry_bucket ASC NULLS FIRST""".stripMargin)),

    // Q4 shape — order-priority checking: orders of one quarter with
    // at least one line shipped more than 90 days after ordering
    // (fixture has no commit/receipt dates; ship-lag stands in).
    // Fact⋈fact LEFT SEMI with the date filter pushed to the orders
    // scan and the non-equi lag condition evaluated inside the hash
    // join — EXISTS never materializes more than the match bit.
    Decl("q_tpch_q4", (spark, dir) => {
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP '1996-04-01 00:00:00'"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_orderpriority"))
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority").asc_nulls_first)
    }, Some(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Q7 shape — volume shipping between two nations: revenue flowing
    // supplier-nation → customer-nation for an ordered pair set, per
    // ship year. supplier/customer broadcast onto the one fact⋈fact
    // join (lineitem⋈orders); the pair filter collapses early.
    Decl("q_tpch_q7", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val supp = Tables(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("supp_nation"),
          col("c_nationkey").as("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(d4(sum(revenue)).as("revenue"))
        .orderBy(col("supp_nation").asc_nulls_first,
          col("cust_nation").asc_nulls_first, col("l_year").asc_nulls_first)
    }, Some(
      s"""SELECT s_nationkey AS supp_nation, c_nationkey AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |  D4(SUM($revenueSql)) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE s_nationkey <> c_nationkey
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation ASC NULLS FIRST, cust_nation ASC NULLS FIRST,
         |  l_year ASC NULLS FIRST""".stripMargin)),

    // Q13 shape — customer order-count distribution: LEFT join so
    // never-matching customers count at zero, per-customer counts,
    // then the count-of-counts histogram. Two keyed aggregations; the
    // second runs over customer-cardinality (already reduced) rows.
    Decl("q_tpch_q13", (spark, dir) => {
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      Tables(spark, dir, "customer").select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }, Some(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // Q17 shape — small-quantity-order revenue: lines under a fifth of
    // their part's average quantity. The per-part mean enters as an
    // INTEGER cross-multiplication (5·qty·n_part < Σqty_part) — no
    // division anywhere, so no engine disagrees at a rounding
    // boundary. Per-part sums aggregate fact-side first (map-side
    // combinable), then re-join the fact by part key.
    Decl("q_tpch_q17", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_partkey"),
          col("l_quantity").cast("long").as("qty"),
          col("l_extendedprice"))
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_part"))
      li.join(perPart, Seq("l_partkey"))
        .filter(col("qty") * 5 * col("n_part") < col("sum_qty"))
        .agg(
          d4(sum(dec(col("l_extendedprice"))) / lit(7).cast("decimal(2,0)"))
            .as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }, Some(
      """WITH pp AS (
        |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |    COUNT(*) AS n_part
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  D4(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) / CAST(7 AS DECIMAL(2,0)))
        |    AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN pp USING (l_partkey)
        |WHERE CAST(l_quantity AS BIGINT) * 5 * n_part < sum_qty""".stripMargin)),

    // Q1 shape — the pricing-summary flagship: ONE filtered scan of
    // the fact table, one 6-group aggregation, no joins at all. The
    // date predicate pushes to parquet; every SUM is exact-decimal so
    // both engines agree bit-for-bit regardless of partial-agg order;
    // the AVG family divides IN DOUBLE ON BOTH SIDES (identical IEEE
    // inputs → identical quotient) because decimal division is the one
    // arithmetic the engines do differently (DuckDB demotes to double,
    // Spark stays exact — SURVEY §7). At 100 TB this is the canonical
    // map-side-combine plan: partials all the way down, a 6-row
    // shuffle.
    Decl("q_tpch_q1", (spark, dir) => {
      val charge = (revenue *
        (lit(1) + frac(col("l_tax"))).cast("decimal(7,6)"))
      Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          d4(sum(dec(col("l_quantity")))).as("sum_qty"),
          d4(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          d4(sum(revenue)).as("sum_disc_price"),
          d4(sum(charge)).as("sum_charge"),
          round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 4)
            .as("avg_qty"),
          round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 4)
            .as("avg_price"),
          round(sum(frac(col("l_discount"))).cast("double") / count(lit(1)), 4)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }, Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  D4(SUM(CAST(l_quantity AS DECIMAL(18,6)))) AS sum_qty,
         |  D4(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))) AS sum_base_price,
         |  D4(SUM($revenueSql)) AS sum_disc_price,
         |  D4(SUM($revenueSql *
         |    CAST(1 + CAST(l_tax AS DECIMAL(8,6)) AS DECIMAL(7,6)))) AS sum_charge,
         |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(*), 4) AS avg_qty,
         |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(*), 4) AS avg_price,
         |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE)
         |    / COUNT(*), 4) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Q9 shape — product-line profit by nation and year. The fixture
    // has no partsupp, so supply cost is proxied by p_retailprice ×
    // quantity (same arithmetic shape: revenue minus a part-priced
    // cost term, summed per (nation, year)). part/supplier/nation are
    // broadcast dims; the ONE shuffle join is lineitem⋈orders on
    // orderkey, then a keyed agg — at 100 TB the name filter prunes
    // part before broadcast, and profit stays exact-decimal.
    Decl("q_tpch_q9", (spark, dir) => {
      val amount = revenue -
        graft.Dsl.mul(dec(col("p_retailprice")), dec(col("l_quantity")))
      val part = Tables(spark, dir, "part")
        .filter(col("p_name").contains("red"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supp = Tables(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(d4(sum(amount)).as("sum_profit"))
        .orderBy(col("nation").asc_nulls_first, col("o_year").asc_nulls_first)
    }, Some(
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  D4(SUM($revenueSql -
         |    CAST(p_retailprice AS DECIMAL(18,6)) *
         |    CAST(l_quantity AS DECIMAL(18,6)))) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY n_name, year(o_orderdate)
         |ORDER BY nation ASC NULLS FIRST, o_year ASC NULLS FIRST""".stripMargin)),

    // Q8 shape — national market share: one supplier-nation's slice of
    // revenue in one region's customer market, per year. Two DISTINCT
    // roles for nation (customer side filters the region, supplier
    // side is the share dimension) — both broadcast, as are part,
    // customer-region, and supplier; the only fact shuffle is
    // lineitem⋈orders. The share ratio follows the q14 idiom (exact
    // decimal sums, one final ROUND); the component sums are ALSO
    // emitted exact so the ratio is cross-checkable.
    Decl("q_tpch_q8", (spark, dir) => {
      val part = Tables(spark, dir, "part")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val custAmerica = Tables(spark, dir, "customer")
        .join(Tables(spark, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables(spark, dir, "region")
          .filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables(spark, dir, "supplier")
        .join(Tables(spark, dir, "nation").select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1995-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val zero = lit(0).cast("decimal(18,6)")
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAmerica), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          d4(sum(when(col("supp_nation") === "NATION_2", revenue).otherwise(zero)))
            .as("nation_volume"),
          d4(sum(revenue)).as("total_volume"),
          round(sum(when(col("supp_nation") === "NATION_2", revenue).otherwise(zero))
            * 100 / sum(revenue), 4).cast("double").as("mkt_share_pct"))
        .orderBy(col("o_year").asc_nulls_first)
    }, Some(
      s"""SELECT year(o_orderdate) AS o_year,
         |  D4(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN $revenueSql
         |           ELSE CAST(0 AS DECIMAL(18,6)) END)) AS nation_volume,
         |  D4(SUM($revenueSql)) AS total_volume,
         |  CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN $revenueSql
         |           ELSE CAST(0 AS DECIMAL(18,6)) END) * 100
         |    / SUM($revenueSql), 4) AS DOUBLE) AS mkt_share_pct
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_type = 'PROMO'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND EXISTS (SELECT 1 FROM customer
         |              JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |              JOIN region ON n1.n_regionkey = r_regionkey
         |              WHERE c_custkey = o_custkey AND r_name = 'AMERICA')
         |GROUP BY year(o_orderdate)
         |ORDER BY o_year ASC NULLS FIRST""".stripMargin)),

    // Q15 shape — top supplier by quarterly revenue: the per-supplier
    // revenue aggregate (TPC-H defines it as a VIEW) joined back
    // against its own scalar MAX. Both the max row and the supplier
    // dim broadcast onto the aggregate; revenue is computed once
    // (Spark reuses the agg subtree on both sides of the self-join at
    // 100 TB via exchange reuse — and the agg output is
    // supplier-cardinality, tiny, regardless).
    Decl("q_tpch_q15", (spark, dir) => {
      val rev = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1996-04-01 00:00:00'"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(d4(sum(revenue)).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("mx"))
        .join(broadcast(Tables(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey").asc_nulls_first)
    }, Some(
      s"""WITH rev AS (
         |  SELECT l_suppkey AS supplier_no,
         |    D4(SUM($revenueSql)) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         |ORDER BY s_suppkey ASC NULLS FIRST""".stripMargin)),

    // Q16 shape — supplier diversity per part profile: distinct
    // supplier counts per (brand, type, size) over the observed
    // part-supplier pairs (the fixture has no partsupp; DISTINCT
    // (l_partkey, l_suppkey) from lineitem is that relation), minus
    // excluded part profiles and minus "complaint" suppliers
    // (s_acctbal < 0 stands in for the comment scan) via NOT IN →
    // null-safe anti join. Part filters push to the scan; the
    // distinct pair reduction is the only fact shuffle.
    Decl("q_tpch_q16", (spark, dir) => {
      // Opt round 22 (guide §2.4): the (l_partkey, l_suppkey) DISTINCT
      // was a full fact exchange that COUNT(DISTINCT l_suppkey) makes
      // redundant — deduping pairs never changes which suppkeys appear
      // under a (brand, type, size) profile, and the complaint anti
      // join filters by suppkey alone. Raw lineitem now broadcast-joins
      // the FILTERED part dim first (rows drop before any exchange),
      // and the single remaining shuffle carries the map-side-deduped
      // (brand, type, size, suppkey) tuples of the distinct aggregate.
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
      val part = Tables(spark, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val complaints = Tables(spark, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc_nulls_first,
          col("p_type").asc_nulls_first, col("p_size").asc_nulls_first)
    }, Some(
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand ASC NULLS FIRST,
        |  p_type ASC NULLS FIRST, p_size ASC NULLS FIRST""".stripMargin)),

    // Q20 shape — suppliers moving serious volume of a part family:
    // per-supplier shipped quantity of name-matched parts in one year,
    // HAVING over the exact-decimal sum, semi-joined into the supplier
    // dim and filtered to one region. part broadcasts into the fact
    // agg; the qualifying-supplier set broadcasts into the dim
    // semi-join; exactly one fact shuffle (the supplier agg).
    Decl("q_tpch_q20", (spark, dir) => {
      val part = Tables(spark, dir, "part")
        .filter(col("p_name").contains("blue")).select(col("p_partkey"))
      val shipped = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 300)
        .select(col("l_suppkey"))
      Tables(spark, dir, "supplier")
        .join(Tables(spark, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 2)
        .join(broadcast(shipped), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey").asc_nulls_first)
    }, Some(
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 2
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE p_name LIKE '%blue%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
        |ORDER BY s_suppkey ASC NULLS FIRST""".stripMargin)),

    // Q21 shape — suppliers who kept orders waiting: for finalized
    // ('F') orders, the suppliers whose shipment was late (>180 days
    // after the order date — the fixture has no commit/receipt dates)
    // on a multi-supplier order where NO other supplier was late.
    // The classic hard join shape: one semi-join (another supplier
    // exists) plus one anti-join (no other LATE supplier) against the
    // same fact, both keyed on l_orderkey — never a cartesian. At
    // 100 TB both probe sides shuffle once on the order key and the
    // late set is date-filtered fact, far smaller than lineitem.
    Decl("q_tpch_q21", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAY"))
        .select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
      // Opt round 22 (guide §2.3/§3): both EXISTS probes are per-order
      // predicates, so they reduce to per-order aggregates instead of
      // joins against row sets. "Another supplier exists" ⟺ the order
      // has ≥2 distinct suppliers ⟺ min(l_suppkey) ≠ max(l_suppkey) —
      // a map-side partial agg that shuffles one narrow row per
      // orderkey where the old semi-join shuffled and sorted EVERY
      // lineitem pair row. "No other late supplier" ⟺ the order's late
      // pair count is exactly 1 — a window count over the SAME
      // orderkey exchange the multi-supplier join needs next, replacing
      // the anti self-join of late against itself.
      val multi = li.groupBy(col("l_orderkey").as("o2"))
        .agg(min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
        .filter(col("smin") =!= col("smax"))
        .select(col("o2"))
      val wOrd = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
      late
        .withColumn("nlate", count(lit(1)).over(wOrd))
        .filter(col("nlate") === 1).drop("nlate")
        .join(multi, col("l_orderkey") === col("o2"), "left_semi")
        .join(broadcast(Tables(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }, Some(
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 180 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late lt
        |JOIN supplier ON lt.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = lt.l_orderkey
        |                AND l2.l_suppkey <> lt.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = lt.l_orderkey
        |                    AND l3.l_suppkey <> lt.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC LIMIT 100""".stripMargin)),

    // Q2 shape — min-cost supplier per part profile. The fixture has
    // no partsupp: MIN exact-decimal l_extendedprice per observed
    // (l_partkey, l_suppkey) pair stands in for ps_supplycost (same
    // stand-in family as q16's DISTINCT pair relation). Candidates are
    // one region's suppliers × one part profile; each part then keeps
    // only its cheapest supplier(s) — the classic correlated-MIN
    // subquery, planned as an aggregate joined back on equality (the
    // q15/q17 idiom, exact decimals so the equality is boundary-free).
    // The pair aggregation is the only fact shuffle; part, the
    // region-supplier dim, and the per-part MIN (part-cardinality,
    // tiny) all broadcast, so at 100 TB lineitem shuffles exactly once.
    Decl("q_tpch_q2", (spark, dir) => {
      val ps = Tables(spark, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(dec(col("l_extendedprice"))).as("ps_supplycost"))
      val part = Tables(spark, dir, "part")
        .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      val euro = Tables(spark, dir, "supplier")
        .join(Tables(spark, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables(spark, dir, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val cand = ps
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
      val minCost = cand.groupBy(col("p_partkey").as("mk"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      cand.join(broadcast(minCost),
          col("p_partkey") === col("mk") &&
            col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), d4(col("ps_supplycost")).as("ps_supplycost"))
        .orderBy(col("s_acctbal").desc_nulls_last, col("n_name").asc_nulls_first,
          col("s_name").asc_nulls_first, col("p_partkey").asc_nulls_first)
        .limit(100)
    }, Some(
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,6))) AS ps_supplycost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |cand AS (
        |  SELECT p_partkey, ps_supplycost, s_name, s_acctbal, n_name
        |  FROM ps
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' AND p_size <= 10 AND p_type = 'STANDARD')
        |SELECT s_acctbal, s_name, n_name, p_partkey,
        |  D4(ps_supplycost) AS ps_supplycost
        |FROM cand c
        |WHERE ps_supplycost = (SELECT MIN(ps_supplycost) FROM cand m
        |                       WHERE m.p_partkey = c.p_partkey)
        |ORDER BY s_acctbal DESC NULLS LAST, n_name ASC NULLS FIRST,
        |  s_name ASC NULLS FIRST, p_partkey ASC NULLS FIRST
        |LIMIT 100""".stripMargin)),

    // Q11 shape — important stock: per-part inventory value held by
    // one nation's suppliers (SUM of exact-decimal extendedprice over
    // that nation's observed part-supplier lineitems stands in for
    // supplycost × availqty), keeping parts whose value exceeds 1/600
    // of the nation total. The HAVING threshold is a
    // cross-multiplication on exact decimals — no division, no float
    // rounding at the filter boundary (the q17 idiom). One fact
    // shuffle (the per-part aggregation); the nation-supplier dim
    // broadcasts and the nation total inlines as a scalar subquery.
    Decl("q_tpch_q11", (spark, dir) => {
      val natSupp = Tables(spark, dir, "supplier")
        .join(Tables(spark, dir, "nation").filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      // the per-part aggregate is MATERIALIZED once (localCheckpoint —
      // it is |parts| rows, bounded and far smaller than the fact
      // table), because it is consumed twice: by the scalar-subquery
      // total and by the main branch. Without this the fact scan runs
      // twice — ReuseExchange does not fire across the subquery
      // boundary (verified on the executed plan).
      val v = Tables(spark, dir, "lineitem")
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("v_exact"))
        .localCheckpoint()
      // the nation total is a SCALAR SUBQUERY (own stage, inlined as a
      // literal) rather than a 1-row broadcast join, so no nested-loop
      // node appears
      v.createOrReplaceTempView("q11_v")
      spark.sql(
        """SELECT l_partkey AS ps_partkey,
          |  CAST(CAST(v_exact AS DECIMAL(18,4)) AS DOUBLE) AS value
          |FROM q11_v
          |WHERE CAST(v_exact AS DECIMAL(28,6)) * 600 >
          |  (SELECT SUM(v_exact) FROM q11_v)
          |ORDER BY value DESC, ps_partkey ASC NULLS FIRST""".stripMargin)
    }, Some(
      """WITH v AS (
        |  SELECT l_partkey AS ps_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS v_exact
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY l_partkey)
        |SELECT ps_partkey, D4(v_exact) AS value
        |FROM v
        |WHERE CAST(v_exact AS DECIMAL(28,6)) * 600 > (SELECT SUM(v_exact) FROM v)
        |ORDER BY value DESC, ps_partkey ASC NULLS FIRST""".stripMargin)))
}
