package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.functions._

/** Product-analytics operators over the `events` stream table:
  * weekly cohort retention, the strict-order conversion funnel, and
  * daily activity rollups. Time bucketing is integer arithmetic on
  * epoch microseconds throughout (the q_win_sessionize precedent) —
  * `date_trunc` week/day anchoring differs across engines, integer
  * division doesn't.
  *
  * Scale shapes: user-keyed aggregations and user-keyed joins only —
  * every shuffle key is the natural analysis key; funnel stage frames
  * shrink monotonically (stage k joins only stage k-1 survivors) and
  * AQE broadcasts them as they collapse.
  */
object EventOps extends Pack {

  private val WeekUs = 7L * 86400L * 1000000L
  private val DayUs = 86400L * 1000000L

  private def ev(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir, "events")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))

  def decls: Seq[Decl] = Seq(

    // Weekly cohort retention: cohort = the user's first active epoch
    // week; each (cohort, weeks-since) cell counts the cohort's users
    // still active that week. Plan shape: ONE user-keyed corpus
    // shuffle — collect_set(wk) per user (bounded by the timeline's
    // week count, with map-side partial sets) subsumes the naive
    // distinct + per-user-min + join-back triple shuffle; exploding
    // the per-user week set against its array_min yields every
    // (cohort, week_n) membership exactly once, so a plain count is
    // the distinct-user count and the final rollup shuffles only
    // cohort-cell cardinality.
    Decl("q_evt_retention", (spark, dir) =>
      ev(spark, dir)
        .groupBy(col("user_id"))
        .agg(collect_set(expr(s"us div $WeekUs")).as("wks"))
        .select(array_min(col("wks")).as("cohort_wk"), explode(col("wks")).as("wk"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_n"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_wk").asc_nulls_first, col("week_n").asc_nulls_first),
      Some(
      s"""WITH act AS (SELECT DISTINCT user_id,
         |    epoch_us(ts) // $WeekUs AS wk FROM events),
         |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY 1)
         |SELECT cohort_wk, wk - cohort_wk AS week_n,
         |  COUNT(DISTINCT act.user_id) AS n_users
         |FROM act JOIN cohort ON act.user_id = cohort.user_id
         |GROUP BY 1, 2
         |ORDER BY cohort_wk ASC NULLS FIRST, week_n ASC NULLS FIRST""".stripMargin)),

    // Strict-order funnel view -> click -> purchase: stage k counts
    // users whose earliest stage-k event happens strictly after their
    // earliest surviving stage-(k-1) event. Plan shape: ONE scan of
    // the three relevant event types (type filter pushed to parquet),
    // ONE user-keyed shuffle, two stacked running windows over the
    // same sort (no re-exchange), one rollup — vs the naive
    // three-scans-three-joins funnel. A click qualifies iff ANY view
    // precedes it (us > running min view-time), which is exactly
    // "after the user's first view"; purchases chain off qualifying
    // clicks the same way.
    Decl("q_evt_funnel", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val before = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val e = ev(spark, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
      val qualified = e
        .withColumn("min_view_b",
          min(when(col("event_type") === "view", col("us"))).over(before))
        .withColumn("click_q", coalesce(
          col("event_type") === "click" && col("us") > col("min_view_b"),
          lit(false)))
        .withColumn("min_clickq_b",
          min(when(col("click_q"), col("us"))).over(before))
        .withColumn("purch_q", coalesce(
          col("event_type") === "purchase" && col("us") > col("min_clickq_b"),
          lit(false)))
      qualified.groupBy(col("user_id"))
        .agg(max(col("event_type") === "view").as("r1"),
          max(col("click_q")).as("r2"), max(col("purch_q")).as("r3"))
        .agg(sum(when(col("r1"), 1L).otherwise(0L)).as("v"),
          sum(when(col("r2"), 1L).otherwise(0L)).as("c"),
          sum(when(col("r3"), 1L).otherwise(0L)).as("p"))
        .select(explode(array(
          struct(lit("1_view").as("stage"), col("v").as("n_users")),
          struct(lit("2_click").as("stage"), col("c").as("n_users")),
          struct(lit("3_purchase").as("stage"), col("p").as("n_users")))).as("s"))
        .select(col("s.stage").as("stage"), col("s.n_users").as("n_users"))
        .orderBy(col("stage").asc_nulls_first)
    }, Some(
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |t1 AS (SELECT user_id, MIN(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e
        |  JOIN t1 ON e.user_id = t1.user_id
        |  WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e
        |  JOIN t2 ON e.user_id = t2.user_id
        |  WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM t1
        |  UNION ALL SELECT '2_click', COUNT(*) FROM t2
        |  UNION ALL SELECT '3_purchase', COUNT(*) FROM t3)
        |ORDER BY stage ASC NULLS FIRST""".stripMargin)),

    // Daily activity rollup: DAU, event volume, and revenue-ish value
    // sum per epoch day — one keyed aggregation, the D4SUM money shape.
    Decl("q_evt_daily", (spark, dir) =>
      ev(spark, dir)
        .groupBy(expr(s"us div $DayUs").as("day"))
        .agg(countDistinct(col("user_id")).as("dau"),
          count(lit(1)).as("n_events"),
          graft.Dsl.d4(sum(graft.Dsl.dec(col("value")))).as("sum_value"))
        .orderBy(col("day").asc_nulls_first),
      Some(
        s"""SELECT epoch_us(ts) // $DayUs AS day,
           |  COUNT(DISTINCT user_id) AS dau, COUNT(*) AS n_events,
           |  D4SUM(value) AS sum_value
           |FROM events GROUP BY 1
           |ORDER BY day ASC NULLS FIRST""".stripMargin)),

    // Daily error-rate anomaly: z-score of each day's error share
    // against the whole timeline's mean/stddev — the monitoring query
    // every event pipeline runs. Two keyed aggregations (days, then a
    // single stats row broadcast back); integer-exact error counts,
    // one final 4dp rounding on the z-score (double-sum order noise —
    // the entropy precedent). Flag = |z| > 2 computed on the ROUNDED
    // value so both engines compare identical doubles.
    Decl("q_evt_anomaly", (spark, dir) => {
      val daily = ev(spark, dir)
        .groupBy(expr(s"us div $DayUs").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
        .withColumn("err_rate", col("n_err").cast("double") / col("n"))
      val stats = daily.agg(
        avg(col("err_rate")).as("mu"),
        stddev_samp(col("err_rate")).as("sigma"))
      daily.crossJoin(broadcast(stats))
        .withColumn("z", round((col("err_rate") - col("mu")) / col("sigma"), 4))
        .select(col("day"), col("n"), col("n_err"),
          round(col("err_rate"), 4).as("err_rate"), col("z"),
          (abs(col("z")) > 2.0).as("anomalous"))
        .orderBy(col("day").asc_nulls_first)
    }, Some(
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // $DayUs AS day, COUNT(*) AS n,
         |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
         |  FROM events GROUP BY 1),
         |d AS (SELECT day, n, CAST(n_err AS BIGINT) AS n_err,
         |    CAST(n_err AS DOUBLE) / n AS err_rate FROM daily),
         |s AS (SELECT AVG(err_rate) AS mu, STDDEV_SAMP(err_rate) AS sigma FROM d)
         |SELECT day, n, n_err, ROUND(err_rate, 4) AS err_rate,
         |  ROUND((err_rate - mu) / sigma, 4) AS z,
         |  abs(ROUND((err_rate - mu) / sigma, 4)) > 2.0 AS anomalous
         |FROM d, s
         |ORDER BY day ASC NULLS FIRST""".stripMargin)),

    // Rolling 7-day distinct active users: each (user, active day)
    // fact is exploded into the 7 report days it covers, so the
    // rolling-distinct count — normally the awkward one (a sliding
    // window can't dedup users across its frame) — becomes one exact
    // distinct + one keyed count. Blowup is a constant 7x on the
    // per-user-day frame (already distinct-reduced), shuffles stay
    // keyed, no self-join over days. Report days past the timeline's
    // end are clipped so every window is a true trailing window.
    Decl("q_evt_rolling7", (spark, dir) => {
      val userDays = ev(spark, dir)
        .select(col("user_id"), expr(s"us div $DayUs").as("day"))
        .distinct()
      val maxDay = userDays.agg(max(col("day")).as("max_day"))
      userDays.crossJoin(broadcast(maxDay))
        .select(col("user_id"),
          explode(sequence(col("day"),
            least(col("day") + 6, col("max_day")))).as("report_day"))
        .distinct()
        .groupBy(col("report_day"))
        .agg(count(lit(1)).as("wau_7d"))
        .orderBy(col("report_day").asc_nulls_first)
    }, Some(
      s"""WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day
         |  FROM events),
         |mx AS (SELECT MAX(day) AS max_day FROM ud),
         |cover AS (SELECT DISTINCT user_id,
         |    unnest(generate_series(day, least(day + 6, max_day))) AS report_day
         |  FROM ud, mx)
         |SELECT report_day, COUNT(*) AS wau_7d
         |FROM cover GROUP BY 1
         |ORDER BY report_day ASC NULLS FIRST""".stripMargin)),

    // Event-type transition matrix: per-user LAG over the time-ordered
    // stream, counted into (prev, next) cells with an exact per-prev
    // probability — the Markov view of user behavior (what follows a
    // view? does error loop?). One user-keyed window shuffle; the cell
    // rollup is |types|² tiny. Probability is integer-ratio rounded at
    // 4dp so both engines divide identical longs.
    Decl("q_evt_transitions", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      val pairs = ev(spark, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy(col("prev_type")).agg(sum(col("n")).as("n_prev"))
      pairs.join(tot, "prev_type")
        .select(col("prev_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("n_prev"), 4).as("p"))
        .orderBy(col("prev_type").asc_nulls_first, col("next_type").asc_nulls_first)
    }, Some(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events),
        |pairs AS (
        |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, SUM(n) AS n_prev FROM pairs GROUP BY 1)
        |SELECT pairs.prev_type, next_type, n,
        |  ROUND(CAST(n AS DOUBLE) / n_prev, 4) AS p
        |FROM pairs JOIN tot ON pairs.prev_type = tot.prev_type
        |ORDER BY pairs.prev_type ASC NULLS FIRST, next_type ASC NULLS FIRST""".stripMargin)),

    // JSON property histogram: parse the `props` payload's `k` key and
    // bucket by decile — the "what's in the event payloads" profiling
    // query. JSON extraction is a codegen'd projection; one keyed
    // aggregation; integer-exact buckets.
    Decl("q_evt_props", (spark, dir) =>
      ev(spark, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"), expr("k div 10").as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type").asc_nulls_first, col("k_bucket").asc_nulls_first),
      Some(
        """SELECT event_type,
          |  CAST(json_extract(props, '$.k') AS INT) // 10 AS k_bucket,
          |  COUNT(*) AS n,
          |  MIN(CAST(json_extract(props, '$.k') AS INT)) AS k_min,
          |  MAX(CAST(json_extract(props, '$.k') AS INT)) AS k_max
          |FROM events GROUP BY 1, 2
          |ORDER BY event_type ASC NULLS FIRST, k_bucket ASC NULLS FIRST""".stripMargin)),

    // Stickiness (DAU/WAU): per epoch week, summed daily actives over
    // distinct weekly actives in basis points — the engagement ratio
    // every product dashboard carries. Single pass: per (week, user)
    // count the user's distinct active days (sum of those = Σdau for
    // the week, row count = wau), then one week-cardinality rollup —
    // one scan, user-keyed shuffles only, NO self-join (the naive
    // dau-frame ⋈ wau-frame plan scans twice; PlanShapeSpec pins
    // this). The ratio is integer division — engine-exact.
    Decl("q_evt_stickiness", (spark, dir) =>
      ev(spark, dir)
        .select(expr(s"us div $DayUs").as("day"), col("user_id"))
        .groupBy(expr("day div 7").as("wk"), col("user_id"))
        .agg(countDistinct(col("day")).as("nd"))
        .groupBy(col("wk"))
        .agg(count(lit(1)).as("wau"), sum(col("nd")).as("sum_dau"))
        .select(col("wk"), col("sum_dau"), col("wau"),
          expr("sum_dau * 10000 div (7 * wau)").as("stickiness_bp"))
        .orderBy(col("wk").asc_nulls_first),
      Some(
      s"""WITH wu AS (
         |  SELECT (epoch_us(ts) // $DayUs) // 7 AS wk, user_id,
         |    COUNT(DISTINCT epoch_us(ts) // $DayUs) AS nd
         |  FROM events GROUP BY 1, 2),
         |w AS (SELECT wk, COUNT(*) AS wau, CAST(SUM(nd) AS BIGINT) AS sum_dau
         |      FROM wu GROUP BY wk)
         |SELECT wk, sum_dau, wau,
         |  sum_dau * 10000 // (7 * wau) AS stickiness_bp
         |FROM w
         |ORDER BY wk ASC NULLS FIRST""".stripMargin)),

    // Activity concentration: what share of all events the most-active
    // 1% of users generate (the power-law health check behind rate
    // limits and abuse triage). Per-user counts (one corpus shuffle,
    // the only corpus-sized stage), a unique total order by
    // (count desc, user_id) so the top-k cut is engine-deterministic,
    // k = ceil(1% of users); shares in integer basis points. The
    // ranked frame is user-cardinality — already 100-1000× reduced —
    // and collapses to ONE row; the single-partition sort it costs is
    // the exact-diagnostic price, bounded by distinct users.
    Decl("q_evt_concentration", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perUser = ev(spark, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      perUser
        .withColumn("rk",
          row_number().over(Window.orderBy(col("c").desc, col("user_id").asc)))
        .withColumn("nu", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .agg(
          count(lit(1)).as("n_users"),
          sum(col("c")).as("n_events"),
          sum(when(col("rk") <= ceil(col("nu") / 100.0), col("c"))
            .otherwise(0L)).as("top1_events"))
        .select(col("n_users"), col("n_events"),
          expr("top1_events * 10000 div n_events").as("top1_share_bp"))
    }, Some(
      """WITH pu AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id ASC) AS rk,
        |        COUNT(*) OVER () AS nu
        |      FROM pu)
        |SELECT COUNT(*) AS n_users,
        |  CAST(SUM(c) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN rk <= CAST(ceil(nu / 100.0) AS BIGINT)
        |    THEN c ELSE 0 END) AS BIGINT) * 10000
        |    // CAST(SUM(c) AS BIGINT) AS top1_share_bp
        |FROM r""".stripMargin)),

    // Session-duration profile: the 30-minute-gap sessionization
    // (q_win_sessionize's split) rolled up to the corpus level —
    // session count, single-event share, exact median/p90 duration in
    // seconds. The per-session reduce keys on (user, session); the
    // percentile state is session-cardinality, already two reductions
    // past the raw events. Durations are integer seconds (µs div 1e6)
    // so the interpolated percentiles divide identical integers.
    Decl("q_evt_sessionstats", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val sess = ev(spark, dir)
        .withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
        .withColumn("sess", sum(col("brk")).over(w))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_ev"),
          expr("(max(us) - min(us)) div 1000000").as("dur_s"))
      sess.agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_single"),
        round(expr("percentile(dur_s, 0.5)"), 4).as("p50_dur_s"),
        round(expr("percentile(dur_s, 0.9)"), 4).as("p90_dur_s"),
        max(col("dur_s")).as("max_dur_s"))
    }, Some(
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (SELECT user_id, us, event_id,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess
        |      FROM g),
        |d AS (SELECT user_id, sess, COUNT(*) AS n_ev,
        |        CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS dur_s
        |      FROM s GROUP BY user_id, sess)
        |SELECT COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
        |  ROUND(QUANTILE_CONT(dur_s, 0.5), 4) AS p50_dur_s,
        |  ROUND(QUANTILE_CONT(dur_s, 0.9), 4) AS p90_dur_s,
        |  MAX(dur_s) AS max_dur_s
        |FROM d""".stripMargin)),

    // Growth accounting: each day's actives split into new (first
    // ever day), retained (active yesterday), resurrected (active
    // before, but not yesterday), plus churned (yesterday's actives
    // who didn't return — only attributable when yesterday is an
    // observed day). ONE user-keyed shuffle produces the per-user
    // day sequence (lag over the distinct (user, day) relation); the
    // day-level rollup and the final day-over-day lag run on
    // timeline-cardinality rows — a deliberate single-partition
    // window over ~30 rows, not a scale risk.
    Decl("q_evt_lifecycle", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val act = ev(spark, dir)
        .select(col("user_id"), expr(s"us div $DayUs").as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
      val daily = act.withColumn("prev", lag(col("day"), 1).over(w))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("dau"),
          sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
          sum(when(col("prev") === col("day") - 1, 1L).otherwise(0L)).as("n_retained"),
          sum(when(col("prev").isNotNull && col("prev") < col("day") - 1, 1L)
            .otherwise(0L)).as("n_resurrected"))
      val wd = Window.orderBy(col("day").asc)
      daily
        .withColumn("n_churned",
          when(lag(col("day"), 1).over(wd) === col("day") - 1,
            lag(col("dau"), 1).over(wd) - col("n_retained")).otherwise(lit(0L)))
        .orderBy(col("day").asc_nulls_first)
    }, Some(
      s"""WITH act AS (SELECT DISTINCT user_id,
         |    epoch_us(ts) // $DayUs AS day FROM events),
         |seq AS (SELECT user_id, day,
         |    LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev FROM act),
         |daily AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau,
         |    CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         |    CAST(SUM(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         |    CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
         |  FROM seq GROUP BY day)
         |SELECT day, dau, n_new, n_retained, n_resurrected,
         |  CAST(CASE WHEN LAG(day) OVER (ORDER BY day) = day - 1
         |       THEN LAG(dau) OVER (ORDER BY day) - n_retained ELSE 0 END AS BIGINT) AS n_churned
         |FROM daily ORDER BY day ASC NULLS FIRST""".stripMargin)),

    // Hour-of-day × day-of-week activity heatmap: pure integer epoch
    // arithmetic (epoch day 0 was a Thursday, hence the +4), one keyed
    // aggregation over ≤168 cells — map-side partials make the shuffle
    // cell-cardinality at any data volume.
    Decl("q_evt_heatmap", (spark, dir) =>
      ev(spark, dir)
        .select(expr(s"(us div $DayUs + 4) % 7").as("dow"),
          expr(s"(us % $DayUs) div 3600000000").as("hour"),
          col("value"))
        .groupBy(col("dow"), col("hour"))
        .agg(count(lit(1)).as("n"), graft.Dsl.d4(sum(graft.Dsl.dec(col("value")))).as("total_value"))
        .orderBy(col("dow").asc_nulls_first, col("hour").asc_nulls_first),
      Some(
        s"""SELECT (epoch_us(ts) // $DayUs + 4) % 7 AS dow,
           |  (epoch_us(ts) % $DayUs) // 3600000000 AS hour,
           |  COUNT(*) AS n, D4SUM(value) AS total_value
           |FROM events
           |GROUP BY 1, 2
           |ORDER BY dow ASC NULLS FIRST, hour ASC NULLS FIRST""".stripMargin)),

    // Activity power law: users binned by floor(log2(events)) — the
    // bucket comes from the BINARY STRING length, not floating log2,
    // so the power-of-two boundaries are exact in both engines. The
    // heavy-tail histogram that decides salting/skew strategy.
    Decl("q_evt_powerlaw", (spark, dir) =>
      ev(spark, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .select((length(bin(col("n"))) - 1).cast("long").as("bucket"), col("n"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_users"),
          min(col("n")).as("min_events"), max(col("n")).as("max_events"))
        .orderBy(col("bucket").asc_nulls_first),
      Some(
        """SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket,
          |  COUNT(*) AS n_users, MIN(n) AS min_events, MAX(n) AS max_events
          |FROM (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
          |GROUP BY 1
          |ORDER BY bucket ASC NULLS FIRST""".stripMargin)),

    // Conversion latency: seconds from a user's FIRST view to their
    // FIRST strictly-later purchase. ONE type-filtered scan and ONE
    // user-keyed shuffle (conditional MIN per type — no view⋈purchase
    // self-join); the percentile rollup runs on converter-cardinality
    // rows. Integer-second deltas keep the quantile inputs exact; the
    // interpolated quantile itself rounds at 4 decimals (the
    // q_evt_sessionstats precedent).
    Decl("q_evt_funnel_time", (spark, dir) => {
      val firsts = ev(spark, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("us"))).as("first_view"),
          min(when(col("event_type") === "purchase", col("us"))).as("first_purchase"))
        .filter(col("first_view").isNotNull && col("first_purchase").isNotNull &&
          col("first_purchase") > col("first_view"))
        .select(expr("(first_purchase - first_view) div 1000000").as("delta_s"))
      firsts.agg(
        count(lit(1)).as("n_converters"),
        round(expr("percentile(delta_s, 0.5)"), 4).as("p50_s"),
        round(expr("percentile(delta_s, 0.9)"), 4).as("p90_s"),
        max(col("delta_s")).as("max_s"))
    }, Some(
      """WITH f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY user_id),
        |d AS (
        |  SELECT (first_purchase - first_view) // 1000000 AS delta_s
        |  FROM f
        |  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        |    AND first_purchase > first_view)
        |SELECT COUNT(*) AS n_converters,
        |  ROUND(QUANTILE_CONT(delta_s, 0.5), 4) AS p50_s,
        |  ROUND(QUANTILE_CONT(delta_s, 0.9), 4) AS p90_s,
        |  MAX(delta_s) AS max_s
        |FROM d""".stripMargin)),

    // Last-touch conversion attribution: each purchase's value is
    // credited to the user's most recent PRIOR non-purchase event
    // type (the "channel"); purchases with no prior touch credit
    // "(direct)". Plan shape: ONE user-keyed window (running
    // last-ignore-nulls over the ordered stream) instead of the naive
    // purchases⋈events self-join with a max-timestamp subquery — no
    // second corpus shuffle, and the final rollup is channel-sized.
    Decl("q_evt_attribution", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val before = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      ev(spark, dir)
        .withColumn("chan",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(before))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("chan"), lit("(direct)")).as("channel"))
        .agg(count(lit(1)).as("n_conv"),
          graft.Dsl.d4(sum(graft.Dsl.dec(col("value")))).as("attr_value"))
        .orderBy(col("channel").asc_nulls_first)
    }, Some(
      """WITH g AS (
        |  SELECT user_id, event_type, value,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS chan
        |  FROM events)
        |SELECT COALESCE(chan, '(direct)') AS channel, COUNT(*) AS n_conv,
        |  D4SUM(value) AS attr_value
        |FROM g WHERE event_type = 'purchase'
        |GROUP BY channel
        |ORDER BY channel ASC NULLS FIRST""".stripMargin)),

    // Top common 3-event paths WITHIN a session (30-min-gap split):
    // the "what do users actually do" n-gram view of the event stream.
    // Plan shape: one user-keyed exchange serves both the sessionize
    // window and the per-session lead window (same partition prefix,
    // stacked sorts, no re-shuffle); path counting shuffles path-
    // cardinality rows; the head is a total order (n DESC, path ASC)
    // so the top-10 boundary is deterministic in both engines.
    Decl("q_evt_paths", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      val ws = Window.partitionBy(col("user_id"), col("sess"))
        .orderBy(col("us").asc, col("event_id").asc)
      ev(spark, dir)
        .withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(wu) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sess", sum(col("brk")).over(wu))
        .withColumn("e2", lead(col("event_type"), 1).over(ws))
        .withColumn("e3", lead(col("event_type"), 2).over(ws))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc_nulls_first)
        .limit(10)
    }, Some(
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (SELECT *, SUM(brk) OVER (
        |        PARTITION BY user_id ORDER BY us, event_id) AS sess FROM g),
        |t AS (SELECT
        |        event_type || '>' || LEAD(event_type, 1) OVER w2
        |          || '>' || LEAD(event_type, 2) OVER w2 AS path,
        |        LEAD(event_type, 2) OVER w2 AS e3
        |      FROM s
        |      WINDOW w2 AS (PARTITION BY user_id, sess ORDER BY us, event_id))
        |SELECT path, COUNT(*) AS n FROM t WHERE e3 IS NOT NULL
        |GROUP BY path
        |ORDER BY n DESC, path ASC NULLS FIRST
        |LIMIT 10""".stripMargin)))
}
