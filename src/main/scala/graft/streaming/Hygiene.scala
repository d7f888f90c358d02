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

  /** Unload exactly ONE stopped query's state-store providers (pass
    * `query.runId` after `query.stop()`). Safe while other streaming
    * queries are live in the same JVM — a restarted query reloads its
    * state from the checkpoint. */
  def unload(runId: java.util.UUID): Unit = GraftStateShim.unloadForRun(runId)

  /** Full between-queries reset for a host with NO live streams (a
    * serial bench between queries): stop the provider registry and
    * maintenance task, clear the SQL cache, and unpersist every
    * retained RDD block (cache() / persist() / localCheckpoint()).
    * Does NOT touch streaming checkpoints on disk — restartability is
    * preserved. NOT safe under concurrently-running streaming queries
    * (the teardown is global). */
  def reset(spark: SparkSession): Unit = {
    GraftStateShim.stopAll()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
