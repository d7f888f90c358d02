package org.apache.spark.sql.execution.streaming.state

/** Visibility shim for state-store hygiene.
  *
  * Every streaming query leaves its `StateStoreProvider`s loaded in
  * the provider registry after `stop()` — by design, so a restarted
  * query rebinds warm state. A host that runs MANY distinct queries
  * in one JVM therefore accumulates one provider (with its in-memory
  * version maps) per (operator x partition x query), squeezing
  * unified execution memory for everything that follows.
  *
  * Two surfaces, for two host shapes:
  *  - [[unloadForRun]] — drop exactly ONE stopped query's providers
  *    (keyed by `queryRunId`). Safe while OTHER streaming queries are
  *    live in the same JVM; the registry map itself is enumerated via
  *    reflection because the object keeps it private.
  *  - [[stopAll]] — `StateStore.stop()`: registry AND the shared
  *    maintenance task torn down synchronously. Only for a QUIET
  *    point with no live streams (a serial bench between queries) —
  *    a global unloadAll() under live queries kills their providers
  *    mid-commit, and even on an idle registry unloadAll (without the
  *    maintenance stop) leaves the maintenance task to self-terminate
  *    asynchronously, racing the next query's provider loads into
  *    RejectedExecutionException.
  */
object GraftStateShim {

  private lazy val providersField = {
    val f = StateStore.getClass.getDeclaredFields
      .find(_.getName.endsWith("loadedProviders"))
      .getOrElse(throw new NoSuchFieldException(
        "StateStore.loadedProviders (Spark internals moved?)"))
    f.setAccessible(true)
    f
  }

  private def registry: scala.collection.mutable.HashMap[StateStoreProviderId, _] =
    providersField.get(StateStore)
      .asInstanceOf[scala.collection.mutable.HashMap[StateStoreProviderId, _]]

  def unloadForRun(runId: java.util.UUID): Unit = {
    val r = registry
    val mine = r.synchronized { r.keys.filter(_.queryRunId == runId).toList }
    mine.foreach(id => StateStore.removeFromLoadedProvidersAndClose(id, None))
  }

  /** Loaded providers belonging to one query run (test hook: unload
    * must remove exactly the stopped run's, nothing else's). */
  def providerCountForRun(runId: java.util.UUID): Int = {
    val r = registry
    r.synchronized { r.keys.count(_.queryRunId == runId) }
  }

  def stopAll(): Unit = StateStore.stop()
}
