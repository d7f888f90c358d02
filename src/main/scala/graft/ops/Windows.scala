package graft.ops

import graft.{Decl, Pack, Tables}
import graft.Dsl.{d4, dec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.2 "Window functions").
  *
  * Determinism: every window ORDER BY ends in a unique key
  * (o_orderkey) so frames are total; RANGE frames are value-bounded
  * and therefore tie-insensitive by construction.
  *
  * Scale: one shuffle per distinct partitionBy key set; all eight
  * queries partition on a column with enough cardinality to spread
  * (o_custkey / o_orderstatus+priority) — no global single-partition
  * window except where the final ORDER BY already requires one.
  */
object Windows extends Pack {

  private val byCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)

  def decls: Seq[Decl] = Seq(

    Decl("q_win_rownum", (spark, dir) =>
      Tables(spark, dir, "orders")
        .withColumn("rn", row_number().over(byCust))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first,
          col("rn").asc_nulls_first),
      Some(
        """SELECT o_custkey, o_orderkey,
          |  ROW_NUMBER() OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
          |FROM orders
          |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
          |  rn ASC NULLS FIRST""".stripMargin)),

    Decl("q_win_rank", (spark, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc)
      Tables(spark, dir, "orders")
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          col("rnk"), col("drnk"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderkey").asc_nulls_first,
          col("o_totalprice").asc_nulls_first, col("rnk").asc_nulls_first,
          col("drnk").asc_nulls_first)
    }, Some(
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
        |  DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
        |FROM orders
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
        |  o_totalprice ASC NULLS FIRST, rnk ASC NULLS FIRST, drnk ASC NULLS FIRST""".stripMargin)),

    Decl("q_win_ntile", (spark, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables(spark, dir, "orders")
        .withColumn("quartile", ntile(4).over(w))
        .select(col("o_orderstatus"), col("o_orderkey"), col("quartile"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderkey").asc_nulls_first,
          col("quartile").asc_nulls_first)
    }, Some(
      """SELECT o_orderstatus, o_orderkey,
        |  NTILE(4) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
        |FROM orders
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
        |  quartile ASC NULLS FIRST""".stripMargin)),

    Decl("q_win_pctcume", (spark, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables(spark, dir, "orders")
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .select(col("o_orderstatus"), col("o_orderkey"), col("pr"), col("cd"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderkey").asc_nulls_first,
          col("pr").asc_nulls_first, col("cd").asc_nulls_first)
    }, Some(
      """SELECT o_orderstatus, o_orderkey,
        |  ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice ASC, o_orderkey ASC), 6) AS pr,
        |  ROUND(CUME_DIST() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice ASC, o_orderkey ASC), 6) AS cd
        |FROM orders
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
        |  pr ASC NULLS FIRST, cd ASC NULLS FIRST""".stripMargin)),

    Decl("q_win_laglead", (spark, dir) =>
      Tables(spark, dir, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1, 0.0).over(byCust))
        .withColumn("next_key", lead(col("o_orderkey"), 1, -1L).over(byCust))
        .select(col("o_custkey"), col("o_orderkey"), col("prev_price"), col("next_key"))
        .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first,
          col("prev_price").asc_nulls_first, col("next_key").asc_nulls_first),
      Some(
        """SELECT o_custkey, o_orderkey,
          |  LAG(o_totalprice, 1, 0.0) OVER w AS prev_price,
          |  LEAD(o_orderkey, 1, -1) OVER w AS next_key
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
          |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
          |  prev_price ASC NULLS FIRST, next_key ASC NULLS FIRST""".stripMargin)),

    Decl("q_win_frame_rows", (spark, dir) =>
      Tables(spark, dir, "orders")
        .withColumn("running_total",
          d4(sum(dec(col("o_totalprice")))
            .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
        .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first,
          col("running_total").asc_nulls_first),
      Some(
        """SELECT o_custkey, o_orderkey,
          |  D4(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS running_total
          |FROM orders
          |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
          |  running_total ASC NULLS FIRST""".stripMargin)),

    // Value-range frame: all orders within 1000 of the current price
    // (below), per (status, priority, customer-bucket). Tie-insensitive
    // because the frame is defined by values, not positions.
    // Narrow 1000-wide band over a composite partition key: Spark's
    // SlidingWindowFunctionFrame re-evaluates the aggregate per row, so
    // cost is O(rows × frame-size) — keep frames tight and partitions
    // plentiful (a wide band over 3 partitions was 20× slower). The
    // o_custkey%16 bucket is load-bearing for scale: (status, priority)
    // alone is ~15 distinct values, so every partition would be ONE
    // task's full sort regardless of cluster size — a RANGE frame's
    // partition key must include a high-cardinality component or the
    // operator caps at ~15-way parallelism at any data volume.
    Decl("q_win_frame_range", (spark, dir) => {
      val over = "OVER (PARTITION BY o_orderstatus, o_orderpriority, o_custkey % 16 " +
        "ORDER BY o_totalprice ASC RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)"
      Tables(spark, dir, "orders")
        .withColumn("n_near", expr(s"COUNT(*) $over"))
        .withColumn("near_sum",
          expr(graft.Dsl.expandOracle(s"D4(SUM(CAST(o_totalprice AS DECIMAL(18,6))) $over)")))
        .select(col("o_orderstatus"), col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"), col("n_near"), col("near_sum"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first,
          col("o_orderkey").asc_nulls_first, col("o_totalprice").asc_nulls_first,
          col("n_near").asc_nulls_first, col("near_sum").asc_nulls_first)
    }, Some(
      """SELECT o_orderstatus, o_orderpriority, o_orderkey, o_totalprice,
        |  COUNT(*) OVER w AS n_near,
        |  D4(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w) AS near_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus, o_orderpriority, o_custkey % 16
        |  ORDER BY o_totalprice ASC
        |  RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
        |  o_orderkey ASC NULLS FIRST, o_totalprice ASC NULLS FIRST,
        |  n_near ASC NULLS FIRST, near_sum ASC NULLS FIRST""".stripMargin)),

    Decl("q_win_firstlast", (spark, dir) => {
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(spark, dir, "orders")
        .withColumn("first_key", first(col("o_orderkey")).over(w))
        .withColumn("last_key", last(col("o_orderkey")).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("first_key"), col("last_key"))
        .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first,
          col("first_key").asc_nulls_first, col("last_key").asc_nulls_first)
    }, Some(
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_key,
        |  LAST_VALUE(o_orderkey) OVER w AS last_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
        |  first_key ASC NULLS FIRST, last_key ASC NULLS FIRST""".stripMargin)),

    // nth_value over the full frame + lead with an explicit default —
    // the two positional window accessors first/last don't cover. The
    // ordering key (o_orderdate, o_orderkey) is unique per partition,
    // so every position is tie-free and engine-deterministic.
    Decl("q_win_nth", (spark, dir) => {
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(spark, dir, "orders")
        .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(w))
        .withColumn("next_key", lead(col("o_orderkey"), 1, -1L).over(byCust))
        .select(col("o_custkey"), col("o_orderkey"), col("second_key"), col("next_key"))
        .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first,
          col("second_key").asc_nulls_first, col("next_key").asc_nulls_first)
    }, Some(
      """SELECT o_custkey, o_orderkey,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_key,
        |  COALESCE(LEAD(o_orderkey, 1) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |    -1) AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
        |  second_key ASC NULLS FIRST, next_key ASC NULLS FIRST""".stripMargin)),

    // Batch sessionization (the window-function formulation of the
    // streaming session_window): a session break is a >30-minute gap,
    // session ids are the running count of breaks — ONE shuffle on
    // user_id serves both windows, then a per-user rollup. Gaps are
    // compared in integer MICROseconds so both engines agree exactly.
    Decl("q_win_sessionize", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      ev.withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
        .withColumn("sess", sum(col("brk")).over(w))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"),
          max(col("n")).as("longest"))
        .orderBy(col("user_id").asc_nulls_first)
    }, Some(
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (SELECT user_id,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess
        |      FROM g),
        |c AS (SELECT user_id, sess, COUNT(*) AS n FROM s GROUP BY user_id, sess)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(n) AS BIGINT) AS n_events, CAST(MAX(n) AS BIGINT) AS longest
        |FROM c GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin)),

    // Time-interval RANGE frame: rolling 7-day order count/revenue per
    // customer — the frame is bounded by a calendar INTERVAL on the
    // timestamp ordering, not by row positions, so it is
    // tie-insensitive and expresses "last week" exactly. Partitioned
    // on o_custkey (full key cardinality — parallelism scales with the
    // data, unlike a low-cardinality status key).
    Decl("q_win_frame_interval", (spark, dir) => {
      val over = "OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC " +
        "RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)"
      Tables(spark, dir, "orders")
        .withColumn("n_7d", expr(s"COUNT(*) $over"))
        .withColumn("sum_7d", expr(graft.Dsl.expandOracle(
          s"D4(SUM(CAST(o_totalprice AS DECIMAL(18,6))) $over)")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("n_7d"), col("sum_7d"))
        .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
    }, Some(
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  COUNT(*) OVER w AS n_7d,
        |  D4(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w) AS sum_7d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC
        |             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin)),

    // Running DISTINCT count over a window — no such native frame
    // aggregate exists, so it composes: flag each (user, event_type)'s
    // FIRST occurrence (row_number over the pair), then a running sum
    // of flags per user. Two shuffles — (user, type) then (user) —
    // both on high-cardinality keys; the naive per-row
    // distinct-within-frame would be O(rows × frame).
    Decl("q_win_running_distinct", (spark, dir) => {
      val ev = graft.Tables(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us").asc, col("event_id").asc)
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("n_distinct_types", sum(col("first_seen")).over(wRun))
        .select(col("user_id"), col("event_id"), col("n_distinct_types"))
        .orderBy(col("user_id").asc_nulls_first, col("event_id").asc_nulls_first)
    }, Some(
      """WITH f AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |                                 ORDER BY epoch_us(ts), event_id) = 1
        |         THEN 1 ELSE 0 END AS first_seen
        |  FROM events)
        |SELECT user_id, event_id,
        |  CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_distinct_types
        |FROM f
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin)),
  )
}
