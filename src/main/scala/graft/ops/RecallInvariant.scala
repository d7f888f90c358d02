package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared recall-invariant harness for the ANN queries
  * (q_llm_simsearch_ivf / q_llm_simsearch_ivfpq): given the exact and
  * approximate top-k as (q_id, vec_id) relations, emit one row per
  * query id with the per-query and aggregate recall bounds pinned as
  * booleans — the DuckDB oracle expects every one TRUE. Keeping the
  * thresholds in ONE place stops the two callers drifting apart.
  */
private[ops] object RecallInvariant {

  /** `queryIds` is the (q_id) relation — passed separately because
    * deriving it from `exact` (select.distinct) would re-run the whole
    * brute-force scoring pipeline just to list 5 ids; the callers have
    * a one-column table scan for it. */
  def apply(exact: DataFrame, approx: DataFrame, queryIds: DataFrame,
      minHitsPerQuery: Long, minHitsTotal: Long): DataFrame = {
    val hits = exact.join(approx, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("h"))
    val perQ = queryIds.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("h"), lit(0L)).as("h"))
    val tot = perQ.agg((sum(col("h")) >= minHitsTotal).as("suite_recall_ok"))
    perQ.crossJoin(broadcast(tot))
      .select(col("q_id"), (col("h") >= minHitsPerQuery).as("recall_ok"),
        col("suite_recall_ok"))
      .orderBy(col("q_id").asc_nulls_first)
  }
}
