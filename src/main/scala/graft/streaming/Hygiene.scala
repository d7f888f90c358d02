package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.state.GraftStateShim

/** Post-query hygiene for hosts that run MANY streaming queries in one
  * JVM (benchmark suites, notebook sessions, multi-tenant drivers).
  *
  * Structured Streaming deliberately keeps each stopped query's
  * state-store providers loaded (a restart rebinds warm state), and
  * `localCheckpoint()` blocks live in the block manager until the
  * GC-driven ContextCleaner happens to run. Neither matters for a
  * one-query-per-JVM production job; both matter for a suite: retained
  * storage squeezes unified execution memory, so later queries spill
  * and bill phantom time (round-12: ~100 s of suite-tail inflation
  * with gc_ms ≈ 0 — retention, not GC pauses).
  *
  * Mirrors the commit protocol's own cleanup discipline
  * (HadoopRelativeTableOperations.java:400-416: every temp artifact is
  * deleted on both the success and failure paths).
  */
object Hygiene {

  /** Unload all loaded state-store providers (safe while no query is
    * running; a restarted query reloads from its checkpoint). */
  def unload(): Unit = GraftStateShim.unloadAllProviders()

  /** Full between-queries reset: drop state-store providers, clear the
    * SQL cache, and unpersist every retained RDD block (cache() /
    * persist() / localCheckpoint()). Does NOT touch streaming
    * checkpoints on disk — restartability is preserved. */
  def reset(spark: SparkSession): Unit = {
    unload()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
