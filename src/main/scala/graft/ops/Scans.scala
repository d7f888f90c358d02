package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.functions._

/** Scans / projection (SURVEY.md §2.2 "Scans / sources / sinks").
  * Full scans stay deterministic by ending in a total ORDER BY on the
  * table's unique key.
  */
object Scans extends Pack {
  def decls: Seq[Decl] = Seq(
    Decl("q_scan_full", (spark, dir) =>
      Tables(spark, dir, "nation")
        .orderBy(col("n_nationkey").asc_nulls_first),
      Some("SELECT * FROM nation ORDER BY n_nationkey ASC NULLS FIRST")),

    Decl("q_scan_proj", (spark, dir) =>
      Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey").asc_nulls_first),
      Some("SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey ASC NULLS FIRST")),
  )
}
