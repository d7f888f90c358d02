package org.apache.spark.sql.execution.streaming.state

/** Visibility shim for state-store hygiene.
  *
  * Every streaming query leaves its `StateStoreProvider`s loaded in the
  * executor-side provider registry after `stop()` — by design, so a
  * restarted query rebinds warm state. A suite (or long-lived driver)
  * that runs MANY distinct queries therefore accumulates one provider
  * (with its in-memory version maps) per (operator × partition × query),
  * squeezing unified execution memory for everything that follows.
  * `StateStore.unloadAll()` drops the registry without stopping the
  * shared maintenance task, which is exactly the hygiene a multi-query
  * host needs; it lives behind `private[sql]`, hence this shim.
  */
object GraftStateShim {
  def unloadAllProviders(): Unit = StateStore.unloadAll()
}
