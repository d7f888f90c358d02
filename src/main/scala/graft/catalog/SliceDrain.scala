package graft.catalog

import graft.meta.DataFile

/** The shared unit-slice machinery behind both streaming sources'
  * file-granular catch-up drains (the table tail's genesis/oversized-
  * append split and the CDC source's genesis split): ONE memoized,
  * path-sorted file list per in-flight admission unit, cap-bounded
  * slice admission with the progress guarantee, and the end-of-drain
  * release. Extracted so a fix to slice stability, the progress
  * guarantee, or the release protocol can only ever need one edit —
  * the same rationale as [[graft.meta.TableMeta.lineageWindowFrom]]
  * for the lineage walks.
  *
  * The list is sorted by path so (seq, fileIdx) offsets slice it
  * reproducibly across triggers, restarts, and checkpoint replays;
  * it is immutable once a drain starts (snapshots are immutable).
  * Memoization makes each trigger O(1) instead of an O(files)
  * re-materialize + re-sort; `release()` (called when a pure-seq
  * offset commits) frees the O(unit-files) driver memory, and a later
  * replay of a sliced range just recomputes the list. Loaders keep
  * their own retention checks — a mid-drain expiry must keep failing
  * loudly with the caller's message.
  */
final class SliceDrain {

  // keyed by (seq, unit kind): the same seq can be a genesis STATE
  // unit, an oversized append's ADDED unit, or a row-level commit's
  // materialized ROWS unit depending on where the stream started and
  // its options, and the lists differ
  @volatile private var cache: Option[(Long, String, IndexedSeq[DataFile])] = None

  /** The unit's file list in stable path order, memoized per
    * (seq, kind). `load` materializes it on a miss ONLY — the
    * caller's per-trigger retention check must run BEFORE calling
    * this (as both sources do), never inside the thunk, or
    * memoization would skip it and a mid-drain expiry would silently
    * re-bind slice indices instead of failing loudly. */
  def list(seq: Long, kind: String)(load: => Seq[DataFile]): IndexedSeq[DataFile] =
    cache match {
      case Some((cs, ck, l)) if cs == seq && ck == kind => l
      case _ =>
        val l = load.sortBy(_.path).toIndexedSeq
        cache = Some((seq, kind, l))
        l
    }

  /** One trigger's admission from `list` starting at `from` under the
    * caps: (exclusive end index, files consumed, rows consumed).
    * The caps are per-CALL, not per-drain: admission derives them from
    * the engine-passed `ReadLimit` each trigger, so a `Trigger.Once`
    * `allAvailable()` run and a capped `ProcessingTime` run share one
    * memoized list. Always admits at least one file when starting from
    * `from` (progress guarantee) — a single file larger than the caps
    * gets a slice of its own; files never split. Rows are manifest
    * record counts: for a unit with live deletes this OVERCOUNTS
    * delivered rows (conservative — a capped batch only ever
    * undershoots its budget). */
  def admit(list: IndexedSeq[DataFile], from: Int,
      maxFiles: Option[Int], maxRows: Option[Long]): (Int, Long, Long) = {
    var i = from; var f = 0L; var r = 0L; var stop = false
    while (i < list.size && !stop) {
      val nf = f + 1; val nr = r + list(i).records
      val exceeds = maxFiles.exists(m => nf > m) || maxRows.exists(m => nr > m)
      if (exceeds && i > from) stop = true
      else { f = nf; r = nr; i += 1 }
    }
    (i, f, r)
  }

  /** End of drain (a pure-seq offset committed): free the memo. */
  def release(): Unit = cache = None
}
