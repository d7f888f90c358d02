package graft.streaming

import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2,
  SupportsAdmissionControl}

/** Slice-aware progress reporting, shared by both streaming sources
  * (the same one-edit rationale as [[ReadLimits]] and the offset
  * codec): while a file-granular drain is in flight the last planned
  * end is a SLICE offset, and reporting the head's pure seq beside it
  * would mix offset forms in the progress metrics — lag readers
  * compare `latestOffset` against `endOffset` in
  * `StreamingQueryProgress` — so the slice is reported until offsets
  * return to pure seqs (STREAMING.md's offset note). */
trait SliceAwareReporting extends SupportsAdmissionControl {

  @volatile private var lastPlannedEnd: Option[(OffsetV2, Boolean)] = None

  /** Record a batch end (`slice` = it names a mid-unit file index).
    * Called from `latestOffset` AND from the batch-construction path:
    * a restart REPLAYS the uncommitted batch from the offset log
    * without planning a new end, and the one-format contract must
    * hold for that batch's progress row too. */
  protected final def recordPlannedEnd(o: OffsetV2, slice: Boolean): Unit =
    lastPlannedEnd = Some((o, slice))

  /** The uncapped latest-available head, in pure-seq form. */
  protected def headOffsetForReport(): OffsetV2

  override def reportLatestOffset(): OffsetV2 = lastPlannedEnd match {
    case Some((o, true)) => o
    case _ => headOffsetForReport()
  }
}
