package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase per-group top-k.
  *
  * A single `row_number() OVER (PARTITION BY q_id ORDER BY ...)` puts
  * the WHOLE corpus-sized candidate set for one query into one task:
  * with a handful of broadcast queries against a 100 TB corpus that is
  * a 20-partition shuffle of everything — the classic window-skew
  * scale killer. The fix mirrors what `TakeOrderedAndProject` does for
  * global top-k: keep the best k per (group, input partition) first —
  * the local window keys are as fine as the scan's parallelism, so no
  * task ever sees more than one input partition's candidates — then
  * rank the surviving <= k * numPartitions rows per group, which is
  * driver-trivial by construction.
  *
  * Identical rows to the one-window form whenever `order` is a TOTAL
  * order (deterministic tie-break): the global top-k is contained in
  * the union of per-slice top-ks. Every caller orders by
  * (score, unique id), so results — and the DuckDB oracles — are
  * unchanged.
  */
object TopK {

  /** Rank rows within each `group` by `order`, keep ranks <= k, with
    * the rank exposed as `rankCol`. */
  def perGroup(df: DataFrame, group: Seq[Column], order: Seq[Column],
      k: Int, rankCol: String): DataFrame = {
    // materialize the slice id in a Project (nondeterministic exprs
    // aren't allowed directly in a window partition spec)
    val sliced = df.withColumn("_pid", spark_partition_id())
    val slice = Window.partitionBy(group :+ col("_pid"): _*).orderBy(order: _*)
    val global = Window.partitionBy(group: _*).orderBy(order: _*)
    sliced.withColumn("_lrk", row_number().over(slice))
      .filter(col("_lrk") <= k)
      .drop("_lrk", "_pid")
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= k)
  }
}
