package graft.ops

import graft.{Decl, Dsl, Pack, Tables}
import graft.Dsl.{d4, dec, frac}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.2 "Aggregations").
  *
  * All double measures are cast to decimal(18,6) before aggregation so
  * Spark and DuckDB compute bit-identical sums (addition order
  * independent), then final outputs to decimal(18,4).
  */
object Aggs extends Pack {

  /** TPC-H Q1-shaped pricing summary — also the flagship `entry`. */
  def q1(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        d4(sum(dec(col("l_quantity")))).as("sum_qty"),
        d4(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        d4(sum(Dsl.mul(dec(col("l_extendedprice")),
          (lit(1) - frac(col("l_discount"))).cast("decimal(7,6)")))).as("sum_disc_price"),
        // outer × stays `*`: the scale-18 product never fits a long,
        // so FastDecMul would only add its wrapper to the same
        // BigDecimal multiply
        d4(sum(Dsl.mul(dec(col("l_extendedprice")),
          (lit(1) - frac(col("l_discount"))).cast("decimal(7,6)"))
          * (lit(1) + frac(col("l_tax"))).cast("decimal(7,6)"))).as("sum_charge"),
        d4(sum(dec(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  D4SUM(l_quantity) AS sum_qty,
      |  D4SUM(l_extendedprice) AS sum_base_price,
      |  D4(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(7,6)))) AS sum_disc_price,
      |  D4(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(7,6)) * CAST(1 + CAST(l_tax AS DECIMAL(8,6)) AS DECIMAL(7,6)))) AS sum_charge,
      |  D4(SUM(CAST(l_quantity AS DECIMAL(18,6))) / COUNT(*)) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // import spark.implicits._ replacement: build Columns via functions.col
  private def $(name: String) = col(name)

  /** Shared closed-form moment expressions (q_agg_skewkurt): ONE text,
    * parsed by both Spark and DuckDB, over exact power sums n/s1..s4 —
    * identical parse → identical double evaluation order → identical
    * bits. Left-assoc `*`/`-` chains only; both engines' SQRT and
    * ROUND(HALF-away-from-zero on doubles) agree.
    */
  private object MomentSql {
    private val mean = "(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))"
    private val r2 = "(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))"
    private val r3 = "(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE))"
    private val r4 = "(CAST(s4 AS DOUBLE)/CAST(n AS DOUBLE))"
    private val m2 = s"($r2 - $mean*$mean)"
    private val m3 = s"($r3 - 3*$mean*$r2 + 2*$mean*$mean*$mean)"
    private val m4 =
      s"($r4 - 4*$mean*$r3 + 6*$mean*$mean*$r2 - 3*$mean*$mean*$mean*$mean)"
    val skew = s"ROUND($m3 / ($m2 * SQRT($m2)), 6)"
    val kurt = s"ROUND($m4 / ($m2 * $m2) - 3, 6)"
  }

  /** Exact Spark `percentile(v, p)` over a pre-counted (group, value,
    * freq) frame, as a cum-count window (opt round 22, guide §2) — no
    * per-group value→count object map, no single-threaded boxed merge;
    * the plan is codegen aggregates plus one window sort. Replicates
    * `Percentile`'s eval double for double: position = p·(N−1) with
    * N = Σfreq; the covering rows of floor(position)/ceil(position)
    * in the frequency-expanded ascending multiset interpolate as
    * (hi−pos)·lowerVal + (pos−lo)·higherVal, with the same-value and
    * integral-position short-circuits (PercentileCumSpec fuzzes the
    * equivalence against the native aggregate). Values are compared
    * and interpolated as doubles; null values are skipped like the
    * native aggregate (a group with only null values is absent from
    * the output — callers left-join if they must keep it). Note the
    * count-frame groupBy has already normalized -0.0 to 0.0, so the
    * SQL `=` short-circuit cannot diverge from the native key-equals.
    * Returns one row per group: (rf, pct). */
  def exactPercentileViaCumCount(cnts0: DataFrame, g: Column, v: Column,
      c: Column, p: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnts = cnts0.filter(v.isNotNull)
      .select(g.as("rf"), v.cast("double").as("v"), c.as("c"))
    // ROWS (not RANGE) cum: strictly increasing per row, so exactly one
    // row covers any 0-based position regardless of tie order — and a
    // covering row's v IS the multiset's value at that position
    val wCum = Window.partitionBy(col("rf")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("rf"))
    val cum = cnts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
      .withColumn("pos", lit(p) * (col("tot") - lit(1L)).cast("double"))
      .withColumn("lo", floor(col("pos")))
      .withColumn("hi", ceil(col("pos")))
    def covers(idx: Column) = col("cum") - col("c") <= idx && col("cum") >= idx + 1
    val isLo = covers(col("lo"))
    val isHi = covers(col("hi"))
    cum.filter(isLo || isHi)
      .groupBy(col("rf"))
      .agg(min(when(isLo, col("v"))).as("lv"),
        min(when(isHi, col("v"))).as("hv"),
        max(col("pos")).as("pos"), max(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .select(col("rf"),
        when(col("hi") === col("lo") || col("lv") === col("hv"), col("lv"))
          .otherwise((col("hi").cast("double") - col("pos")) * col("lv") +
            (col("pos") - col("lo").cast("double")) * col("hv")).as("pct"))
  }

  def decls: Seq[Decl] = Seq(
    Decl("q_agg_group", q1, Some(q1Sql)),

    Decl("q_agg_global", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      li.agg(
        d4(sum(dec($("l_extendedprice")))).as("sum_price"),
        count(lit(1)).as("n_rows"),
        d4(min(dec($("l_quantity")))).as("min_qty"),
        d4(max(dec($("l_quantity")))).as("max_qty"),
        d4(sum(dec($("l_discount"))) / count($("l_discount"))).as("avg_disc"))
    }, Some(
      """SELECT
        |  D4SUM(l_extendedprice) AS sum_price,
        |  COUNT(*) AS n_rows,
        |  D4(MIN(CAST(l_quantity AS DECIMAL(18,6)))) AS min_qty,
        |  D4(MAX(CAST(l_quantity AS DECIMAL(18,6)))) AS max_qty,
        |  D4(SUM(CAST(l_discount AS DECIMAL(18,6))) / COUNT(l_discount)) AS avg_disc
        |FROM lineitem""".stripMargin)),

    // Two multi-column COUNT(DISTINCT)s in one aggregate plan as
    // Expand ×3 — every fact row tripled into the exchange (16 MB,
    // the scan stage's whole cost). Split per distinct set (opt round
    // 22, guide §2.3 dedupe-first): a single-distinct aggregate plans
    // WITHOUT Expand (partial agg keyed (group, distinct-cols) dedups
    // map-side), so each branch shuffles only its distinct tuples and
    // the 3-row-per-branch results broadcast-join back on the group.
    Decl("q_agg_distinct", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val ords = li.groupBy($("l_returnflag"))
        .agg(countDistinct($("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
      val pairs = li.groupBy($("l_returnflag").as("rf2"))
        .agg(countDistinct($("l_partkey"), $("l_suppkey")).as("n_part_supp"))
      ords.join(broadcast(pairs), $("l_returnflag") <=> $("rf2"))
        .select($("l_returnflag"), $("n_orders"), $("n_part_supp"), $("n_rows"))
        .orderBy($("l_returnflag").asc_nulls_first)
    }, Some(
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    Decl("q_agg_cond", (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      o.groupBy($("o_orderpriority"))
        .agg(
          sum(when($("o_orderstatus") === "F", lit(1)).otherwise(lit(0))).as("n_f"),
          d4(sum(when($("o_totalprice") > 100000, dec($("o_totalprice"))).otherwise(lit(0)))).as("big_total"),
          count(when($("o_orderstatus") === "O", lit(1))).as("n_open"))
        .orderBy($("o_orderpriority").asc_nulls_first)
    }, Some(
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  D4(SUM(CASE WHEN o_totalprice > 100000 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE 0 END)) AS big_total,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Decl("q_agg_rollup", (spark, dir) =>
      Tables(spark, dir, "orders")
        .rollup($("o_orderstatus"), $("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          d4(sum(dec($("o_totalprice")))).as("total"))
        .orderBy($("o_orderstatus").asc_nulls_first, $("o_orderpriority").asc_nulls_first),
      Some(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |  D4SUM(o_totalprice) AS total
          |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Decl("q_agg_cube", (spark, dir) =>
      Tables(spark, dir, "orders")
        .cube($("o_orderstatus"), $("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          d4(sum(dec($("o_totalprice")))).as("total"))
        .orderBy($("o_orderstatus").asc_nulls_first, $("o_orderpriority").asc_nulls_first),
      Some(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |  D4SUM(o_totalprice) AS total
          |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Decl("q_agg_gsets", (spark, dir) => {
      Tables(spark, dir, "orders").createOrReplaceTempView("orders_gs")
      spark.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_pri,
          |  COUNT(*) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
          |  g_status ASC NULLS FIRST, g_pri ASC NULLS FIRST, n ASC NULLS FIRST""".stripMargin)
    }, Some(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
        |  g_status ASC NULLS FIRST, g_pri ASC NULLS FIRST, n ASC NULLS FIRST""".stripMargin)),

    Decl("q_agg_stats", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"))
        .agg(
          d4(round(stddev_samp($("l_quantity")), 4)).as("sd_qty"),
          d4(round(var_samp($("l_quantity")), 4)).as("var_qty"),
          count(lit(1)).as("n"))
        .orderBy($("l_returnflag").asc_nulls_first),
      Some(
        """SELECT l_returnflag,
          |  D4(STDDEV_SAMP(l_quantity)) AS sd_qty,
          |  D4(VAR_SAMP(l_quantity)) AS var_qty,
          |  COUNT(*) AS n
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // Higher-moment stats (population skewness / excess kurtosis).
    // Native skewness()/kurtosis() differ between engines (sample vs
    // population corrections, streaming-update float drift), so the
    // moments are computed from EXACT integer power sums — l_quantity
    // is integral, q^4 ≤ 6.25e6 per term, sums accumulate in
    // decimal(38,0)/int128 (overflow-safe past 10^30 rows) — and the
    // closed form then runs on scalar doubles in ONE textual
    // expression order shared verbatim by both engines, so results
    // are bit-identical before the 6dp round. Scale shape: a single
    // keyed agg with map-side partials; the double math touches only
    // group-cardinality rows.
    Decl("q_agg_skewkurt", (spark, dir) => {
      val q = col("l_quantity").cast("bigint")
      Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(q.cast("decimal(38,0)")).as("s1"),
          sum((q * q).cast("decimal(38,0)")).as("s2"),
          sum((q * q * q).cast("decimal(38,0)")).as("s3"),
          sum((q * q * q * q).cast("decimal(38,0)")).as("s4"))
        .select($("l_returnflag"), $("n"),
          expr(MomentSql.skew).as("skew_qty"),
          expr(MomentSql.kurt).as("kurt_qty"))
        .orderBy($("l_returnflag").asc_nulls_first)
    }, Some(
      s"""WITH p AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS BIGINT)) AS s1,
        |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
        |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s3,
        |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ${MomentSql.skew} AS skew_qty,
        |  ${MomentSql.kurt} AS kurt_qty
        |FROM p
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // Exact percentiles, computed distributed (opt round 22, guide §2):
    // plain percentile() is a TypedImperativeAggregate whose partial
    // builds a value→count OpenHashMap over EVERY row in the (single
    // row group ⇒ single) scan task, ships the serialized maps
    // (5.4 MB here) and merges + sorts them single-threaded per group
    // — ~0.8 s of boxed-object work for the near-unique price column.
    // Rewrite: ONE codegen count by (flag, qty, price) feeds both
    // percentiles — the 50-value qty through percentile(v, p, freq)
    // (the same aggregate code over tiny per-value maps, identical by
    // construction), the near-unique price through
    // [[exactPercentileViaCumCount]], a cum-count window replicating
    // Spark's interpolation double-for-double (PercentileCumSpec
    // fuzzes the equivalence). No object maps remain on the
    // high-cardinality path.
    Decl("q_agg_percentile", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      // per-branch counts: each pass scans only its 2 columns (column
      // pruning), and the qty branch's exchange is ~|distinct qty|·3
      // rows, so its percentile map is trivial
      val qty = li
        .groupBy($("l_returnflag").as("rf"), $("l_quantity"))
        .agg(count(lit(1)).as("freq"))
        .groupBy($("rf"))
        .agg(d4(round(expr("percentile(l_quantity, 0.5, freq)"), 4)).as("median_qty"))
      val price = exactPercentileViaCumCount(
        li.groupBy($("l_returnflag").as("rf"), $("l_extendedprice"))
          .agg(count(lit(1)).as("freq")),
        col("rf"), col("l_extendedprice"), col("freq"), 0.9)
      qty.join(broadcast(price.select($("rf").as("rf2"), $("pct").as("p90"))),
          $("rf") <=> $("rf2"), "left")
        .select($("rf").as("l_returnflag"), $("median_qty"),
          d4(round($("p90"), 4)).as("p90_price"))
        // group-cardinality rows: pinning them to one materialized
        // partition stops the global sort's range-sampling pass from
        // re-evaluating the aggregate stages (AQE only materializes at
        // exchanges, so orderBy directly over the agg ran them twice)
        .repartition(1)
        .orderBy($("l_returnflag").asc_nulls_first)
    },
      Some(
        """SELECT l_returnflag,
          |  D4(QUANTILE_CONT(l_quantity, 0.5)) AS median_qty,
          |  D4(QUANTILE_CONT(l_extendedprice, 0.9)) AS p90_price
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // Most-frequent value per group (mode). Spark's native mode() and
    // DuckDB's mode() both break frequency ties arbitrarily, so the
    // declared semantics pin the tie: the SMALLEST modal value wins —
    // count per (group, value), then a one-row-per-group window top-1
    // ordered (count DESC, value ASC). Scale shape: the heavy agg is
    // the (group, value)-keyed count; the window partitions are
    // value-cardinality-sized, not row-sized.
    Decl("q_agg_mode", (spark, dir) => {
      val counts = Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"), $("l_quantity"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($("l_returnflag"))
        .orderBy($("c").desc, $("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter($("rn") === 1)
        .select($("l_returnflag"), $("l_quantity").as("mode_qty"), $("c").as("mode_n"))
        .orderBy($("l_returnflag").asc_nulls_first)
    }, Some(
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_quantity AS mode_qty, c AS mode_n
        |FROM c
        |QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |                           ORDER BY c DESC, l_quantity ASC) = 1
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // Nested outputs are serialized with to_json on BOTH sides: the
    // driver's checker sorts/hashes via pandas, which cannot sort raw
    // array cells — the JSON text forms are byte-identical between
    // Spark and DuckDB for list/struct of int/string.
    Decl("q_agg_collect", (spark, dir) =>
      Tables(spark, dir, "nation")
        .groupBy($("n_regionkey"))
        .agg(
          to_json(sort_array(collect_list($("n_name")))).as("names"),
          to_json(sort_array(collect_set($("n_regionkey")))).as("keys"))
        .orderBy($("n_regionkey").asc_nulls_first),
      Some(
        """SELECT n_regionkey,
          |  CAST(to_json(list_sort(list(n_name))) AS VARCHAR) AS names,
          |  CAST(to_json(list_sort(list(DISTINCT n_regionkey))) AS VARCHAR) AS keys
          |FROM nation GROUP BY n_regionkey
          |ORDER BY n_regionkey ASC NULLS FIRST""".stripMargin)),

    // Deterministic first/last per group: the orderer (o_orderkey) is
    // unique, so min_by/max_by ties cannot occur.
    Decl("q_agg_firstlast", (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy($("o_custkey"))
        .agg(
          min_by($("o_totalprice"), $("o_orderkey")).as("first_price"),
          max_by($("o_totalprice"), $("o_orderkey")).as("last_price"),
          min($("o_orderkey")).as("first_key"))
        .orderBy($("o_custkey").asc_nulls_first),
      Some(
        """SELECT o_custkey,
          |  ARG_MIN(o_totalprice, o_orderkey) AS first_price,
          |  ARG_MAX(o_totalprice, o_orderkey) AS last_price,
          |  MIN(o_orderkey) AS first_key
          |FROM orders GROUP BY o_custkey
          |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin)),

    // Skew-aware two-phase aggregation: salt the (few, heavy) group
    // keys across 16 partial groups, partially aggregate, then merge.
    // Same result as a direct groupBy — but at 100 TB a 3-value key
    // would otherwise hash 1/3 of the table into one reducer; the salt
    // spreads the partial work across the cluster.
    Decl("q_agg_salted", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      li.withColumn("salt", pmod(xxhash64($("l_orderkey"), $("l_linenumber")), lit(16)))
        .groupBy($("l_returnflag"), $("salt"))
        .agg(
          sum(dec($("l_quantity"))).as("pq"),
          count(lit(1)).as("pn"))
        .groupBy($("l_returnflag"))
        .agg(
          d4(sum($("pq"))).as("sum_qty"),
          sum($("pn")).as("n_rows"))
        .orderBy($("l_returnflag").asc_nulls_first)
    }, Some(
      """SELECT l_returnflag,
        |  D4SUM(l_quantity) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // PIVOT: rows → columns over an explicit value list (explicit
    // values keep it one pass — Spark's value-discovering overload
    // prepends a distinct job). Same partial-agg shuffle as a groupBy;
    // each pivot column is one conditional aggregate.
    Decl("q_agg_pivot", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(d4(sum(dec($("l_quantity")))))
        .orderBy($("l_returnflag").asc_nulls_first),
      Some(
        """SELECT l_returnflag,
          |  D4(SUM(CASE WHEN l_linestatus = 'F'
          |    THEN CAST(l_quantity AS DECIMAL(18,6)) END)) AS F,
          |  D4(SUM(CASE WHEN l_linestatus = 'O'
          |    THEN CAST(l_quantity AS DECIMAL(18,6)) END)) AS O
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // UNPIVOT (melt): columns → rows. Pure narrow map (each input row
    // emits k rows, no shuffle until the final sort) — the wide-table
    // → long-table reshape feature stores need.
    Decl("q_agg_unpivot", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter($("l_orderkey") < 200)
        .unpivot(
          Array($("l_orderkey"), $("l_linenumber")),
          Array($("l_quantity"), $("l_extendedprice"), $("l_discount")),
          "metric", "val")
        .orderBy($("l_orderkey").asc_nulls_first, $("l_linenumber").asc_nulls_first,
          $("metric").asc_nulls_first, $("val").asc_nulls_first),
      Some(
        """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
          |FROM lineitem WHERE l_orderkey < 200
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          |FROM lineitem WHERE l_orderkey < 200
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          |FROM lineitem WHERE l_orderkey < 200
          |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
          |  metric ASC NULLS FIRST, val ASC NULLS FIRST""".stripMargin)),

    // Approx distinct: engine-side only (HLL sketches differ between
    // engines); OpsSpec asserts relative error vs the exact count.
    Decl("q_agg_hll", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"))
        .agg(approx_count_distinct($("l_orderkey"), 0.02).as("approx_orders"))
        .orderBy($("l_returnflag").asc_nulls_first),
      None),

    // Oracle-checkable INVARIANT of the HLL estimate: the sketch
    // value itself is engine-specific (q_agg_hll stays self-checked),
    // but the exact distinct count and the promise "estimate within
    // 5% of exact" are cross-engine facts — the oracle recomputes the
    // exact side and pins the bound as a literal TRUE, so an HLL
    // regression (wrong hashing, wrong merge) fails the DuckDB gate,
    // not just a local spec.
    // Perf shape (opt round 21, guide §2.3): countDistinct beside
    // approx_count_distinct in ONE agg makes Catalyst plan the
    // non-distinct HLL as a partial sketch PER DISTINCT KEY — the
    // exchange carried 410 columns of HLL register state per
    // (flag, orderkey) row (measured: 12 MB shuffle, 11-49 s of task
    // time merging sketch buffers). Dedup the keys first, then count +
    // sketch the deduped keys: HLL is duplicate-insensitive, so the
    // estimate (and the exact count) are bit-identical, while the
    // exchange carries 2 narrow columns and exactly 3 sketches exist.
    Decl("q_agg_hll_inv", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .select($("l_returnflag"), $("l_orderkey"))
        .distinct()
        .groupBy($("l_returnflag"))
        .agg(count($("l_orderkey")).as("exact_orders"),
          approx_count_distinct($("l_orderkey"), 0.02).as("est"))
        .select($("l_returnflag"), $("exact_orders"),
          (abs($("est") - $("exact_orders")).cast("double") <=
            $("exact_orders").cast("double") * 0.05).as("within_5pct"))
        .orderBy($("l_returnflag").asc_nulls_first),
      Some(
        """SELECT l_returnflag,
          |  COUNT(DISTINCT l_orderkey) AS exact_orders,
          |  TRUE AS within_5pct
          |FROM lineitem
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // Mergeable HLL SKETCHES as values (Datasketches hll_sketch_agg /
    // hll_union_agg) — the architecture behind every incremental
    // distinct-count rollup at 100 TB: per-group sketches materialize
    // once (here per (flag, status) cell), then ANY rollup — per flag,
    // global, per day in a real pipeline — is a cheap union of the
    // stored sketches, never a re-scan of the raw corpus. Engine-side
    // only (sketch bytes are implementation-specific); OpsSpec bounds
    // the estimate against the exact distinct.
    // Oracled via the same invariant pattern as q_agg_hll_inv: the
    // sketch bytes and the merged estimate are engine-specific
    // (OpsSpec bounds the raw estimate), but "union of per-cell
    // sketches estimates within 5% of the exact rollup" is a
    // cross-engine fact — a lossy union (dropped registers, wrong
    // merge) fails the DuckDB gate.
    Decl("q_agg_hll_merge", (spark, dir) => {
      val cells = Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"), $("l_linestatus"))
        .agg(hll_sketch_agg($("l_orderkey")).as("sk"))
      val merged = cells.groupBy($("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg($("sk"))).as("est"))
      val exact = Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"))
        .agg(countDistinct($("l_orderkey")).as("exact_orders"))
      merged.join(exact, "l_returnflag")
        .select($("l_returnflag"), $("exact_orders"),
          (abs($("est") - $("exact_orders")).cast("double") <=
            $("exact_orders").cast("double") * 0.05).as("within_5pct"))
        .orderBy($("l_returnflag").asc_nulls_first)
    }, Some(
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS within_5pct
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // Approx percentile: Greenwald-Khanna quantile sketch (mergeable,
    // bounded memory) — at 100 TB the exact percentile's full sort-
    // per-group is the thing you can't afford; the sketch is one
    // map-side-combinable agg. The sketch VALUES are engine-specific
    // (OpsSpec bounds them), but the sketch's CONTRACT is a
    // cross-engine fact: with accuracy=1000 the returned element's
    // rank is within n/1000 of the target rank. The query measures
    // that rank directly (count of values <= the returned element —
    // one broadcast of the 3-row sketch output back over the scan)
    // and pins the bound as a literal TRUE, so a broken sketch fails
    // the DuckDB gate, not just a local spec. Tolerance 0.005n + 1
    // (5x the guarantee) absorbs duplicate-value rank inflation.
    Decl("q_agg_approxpct", (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select($("l_returnflag").as("f"), $("l_extendedprice").cast("double").as("v"))
      val ap = li.groupBy($("f")).agg(
        expr("approx_percentile(v, 0.5, 1000)").as("p50"),
        expr("approx_percentile(v, 0.99, 1000)").as("p99"),
        count(lit(1)).as("n_rows"))
      li.join(broadcast(ap), "f")
        .groupBy($("f"), $("n_rows"))
        .agg(sum(when($("v") <= $("p50"), 1L).otherwise(0L)).as("r50"),
          sum(when($("v") <= $("p99"), 1L).otherwise(0L)).as("r99"))
        .select($("f").as("l_returnflag"), $("n_rows"),
          (abs($("r50") - $("n_rows") * 0.5) <= $("n_rows") * 0.005 + 1).as("p50_rank_ok"),
          (abs($("r99") - $("n_rows") * 0.99) <= $("n_rows") * 0.005 + 1).as("p99_rank_ok"))
        .orderBy($("l_returnflag").asc_nulls_first)
    }, Some(
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  TRUE AS p50_rank_ok, TRUE AS p99_rank_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // Histogram: fixed-width bucketing of order totals — one map-side-
    // combinable aggregation; integer bucket arithmetic is exact in
    // both engines.
    Decl("q_agg_histogram", (spark, dir) =>
      Tables(spark, dir, "orders")
        .withColumn("bucket", floor($("o_totalprice") / 50000.0).cast("long"))
        .groupBy($("bucket"))
        .agg(count(lit(1)).as("n"),
          min($("o_totalprice")).cast("decimal(18,2)").cast("double").as("lo"),
          max($("o_totalprice")).cast("decimal(18,2)").cast("double").as("hi"))
        .orderBy($("bucket").asc_nulls_first),
      Some(
        """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
          |  COUNT(*) AS n,
          |  CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS lo,
          |  CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS hi
          |FROM orders GROUP BY bucket
          |ORDER BY bucket ASC NULLS FIRST""".stripMargin)),

    // Boolean/conditional aggregate surface: bool_and / bool_or /
    // count_if, plus any_value pinned deterministic via min (bare
    // any_value is explicitly "any" — unbenchmarkable across engines).
    // One map-side-combinable aggregation.
    Decl("q_agg_bool", (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy($("o_orderpriority"))
        .agg(
          bool_and($("o_totalprice") > 1000.0).as("all_over_1k"),
          bool_or($("o_orderstatus") === "F").as("any_final"),
          count_if($("o_totalprice") > 200000.0).as("n_big"),
          min($("o_orderstatus")).as("first_status"),
          count(lit(1)).as("n"))
        .orderBy($("o_orderpriority").asc_nulls_first),
      Some(
        """SELECT o_orderpriority,
          |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
          |  bool_or(o_orderstatus = 'F') AS any_final,
          |  CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
          |  MIN(o_orderstatus) AS first_status,
          |  COUNT(*) AS n
          |FROM orders GROUP BY o_orderpriority
          |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Pearson correlation, computed from exact decimal power sums
    // rather than the built-in corr() (whose double accumulation is
    // partition-order-dependent — unbenchmarkable across engines).
    // Sxy fits decimal(38,12): qty ≤ 50 (scale 6) × price ≤ 1e5
    // (scale 6) summed over the group. The final expression is pure
    // double IEEE arithmetic on bit-identical inputs, so both engines
    // emit the same bits; one map-side-combinable aggregation.
    Decl("q_agg_corr", (spark, dir) => {
      val x = dec($("l_quantity"))
      val y = dec($("l_extendedprice"))
      val n = count(lit(1)).cast("double")
      val sx = sum(x).cast("double");  val sy = sum(y).cast("double")
      // x·x and x·y fit a long unscaled (qty ≤ 50, price ≤ 1.05e5 at
      // scale 6 → ≤ 5.3e18); y·y (price²) never does — plain `*` there
      val sxx = sum(Dsl.mul(x, x).cast("decimal(38,12)")).cast("double")
      val syy = sum((y * y).cast("decimal(38,12)")).cast("double")
      val sxy = sum(Dsl.mul(x, y).cast("decimal(38,12)")).cast("double")
      Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"))
        .agg(round((n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("corr_qty_price"),
          count(lit(1)).as("n"))
        .orderBy($("l_returnflag").asc_nulls_first)
    }, Some(
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_rows,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,6)) *
        |      CAST(l_quantity AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,6)) *
        |      CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,6)) *
        |      CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price,
        |  n_rows AS n
        |FROM s ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // Weighted mean: price weighted by quantity per return flag. Both
    // component sums are exact decimals (the numerator a full
    // decimal×decimal product, never a double intermediate); only the
    // final ratio divides, in DOUBLE on both engines (the q1 AVG
    // idiom), so the filterable quantities stay boundary-free.
    Decl("q_agg_weighted", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy($("l_returnflag"))
        .agg(
          d4(sum(Dsl.mul(dec($("l_extendedprice")), dec($("l_quantity"))))).as("sum_pq"),
          d4(sum(dec($("l_quantity")))).as("sum_q"),
          round(sum(Dsl.mul(dec($("l_extendedprice")), dec($("l_quantity")))).cast("double") /
            sum(dec($("l_quantity"))).cast("double"), 6).as("weighted_avg_price"))
        .orderBy($("l_returnflag").asc_nulls_first),
      Some(
        """SELECT l_returnflag,
          |  D4(SUM(CAST(l_extendedprice AS DECIMAL(24,6)) * CAST(l_quantity AS DECIMAL(14,6)))) AS sum_pq,
          |  D4SUM(l_quantity) AS sum_q,
          |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6)) * CAST(l_quantity AS DECIMAL(14,6))) AS DOUBLE) /
          |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS weighted_avg_price
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // arg-max/arg-min: the value of one column at another's extremum
    // (max_by/min_by ↔ DuckDB arg_max/arg_min). max_by on a tied key
    // is explicitly unspecified in both engines — and the fixture DOES
    // tie (duplicate (orderkey,linenumber) rows with different parts),
    // so the ordering key folds the reported value in as its low
    // digits: ties then agree on the value by construction. Key-domain
    // bound: the 10^9 fold keeps (orderkey,linenumber) ordering intact
    // for l_partkey < 10^9 (TPC-H partkey reaches 10^9 near SF 5000),
    // and the whole key fits int64 for l_orderkey < 9.2×10^8; past
    // either bound switch the fold to DECIMAL(38,0) arithmetic.
    Decl("q_agg_argmax", (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .withColumn("uk",
          ($("l_orderkey") * 10 + $("l_linenumber")) * 1000000000L + $("l_partkey"))
        .groupBy($("l_returnflag"))
        .agg(
          max_by($("l_partkey"), $("uk")).as("last_part"),
          min_by($("l_partkey"), $("uk")).as("first_part"),
          max($("uk")).as("max_uk"))
        .orderBy($("l_returnflag").asc_nulls_first),
      Some(
        """SELECT l_returnflag,
          |  arg_max(l_partkey, CAST((l_orderkey * 10 + l_linenumber) * 1000000000 + l_partkey AS BIGINT)) AS last_part,
          |  arg_min(l_partkey, CAST((l_orderkey * 10 + l_linenumber) * 1000000000 + l_partkey AS BIGINT)) AS first_part,
          |  MAX(CAST((l_orderkey * 10 + l_linenumber) * 1000000000 + l_partkey AS BIGINT)) AS max_uk
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),
  )
}
