package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-sequence semantics for the events-analytics ops: the
  * funnel's strict ordering (a purchase BEFORE the first qualifying
  * click must not convert) and retention's cohort anchoring — cases a
  * whole-corpus aggregate oracle can mask.
  */
class EventOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("evt").toString
    // write micros-precision timestamps; the op reads via graft.Tables
    df.withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    ops.EventOps.decls.find(_.name == name).get.fn(spark, dir).collect()
  }

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("q_evt_funnel: out-of-order stages do not convert") {
    val rows = Seq(
      // user 1: view -> click -> purchase (full conversion)
      (0L, ts(1), 1L, "view", 0.0, "{}"),
      (1L, ts(2), 1L, "click", 0.0, "{}"),
      (2L, ts(3), 1L, "purchase", 0.0, "{}"),
      // user 2: purchase BEFORE any click — stage 3 must not count
      (3L, ts(1), 2L, "view", 0.0, "{}"),
      (4L, ts(2), 2L, "purchase", 0.0, "{}"),
      (5L, ts(3), 2L, "click", 0.0, "{}"),
      // user 3: click before any view — stages 2/3 must not count
      (6L, ts(1), 3L, "click", 0.0, "{}"),
      (7L, ts(2), 3L, "view", 0.0, "{}"))
    val got = run("q_evt_funnel", rows)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L),
      s"strict-order funnel broken: $got")
  }

  test("q_evt_retention: cohorts anchor to each user's first active week") {
    val wk = 7 * 24 * 60 // minutes in a week — build two distinct weeks
    def tsm(minute: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L)
    val rows = Seq(
      // user 1 active weeks 0 and 1; user 2 first appears in week 1
      (0L, tsm(1), 1L, "view", 0.0, "{}"),
      (1L, tsm(wk + 1), 1L, "view", 0.0, "{}"),
      (2L, tsm(wk + 2), 2L, "view", 0.0, "{}"))
    val cells = run("q_evt_retention", rows)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user 1's cohort: week-0 and week-1 cells; user 2's LATER cohort:
    // its own week-0 cell — NOT merged into user 1's week-1.
    val cohorts = cells.map(_._1).distinct.sorted
    assert(cohorts.size == 2, s"two distinct cohorts expected: $cells")
    val (c0, c1) = (cohorts.head, cohorts.last)
    assert(cells.toSet == Set((c0, 0L, 1L), (c0, 1L, 1L), (c1, 0L, 1L)),
      s"unexpected retention cells: $cells")
  }
}
