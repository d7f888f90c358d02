package graft.catalog

import graft.meta.RelPaths
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Table maintenance — the C16 bulk-IO analogs (RelativeFileIO.java
  * deleteFiles/listPrefix/deletePrefix) put to their real use:
  * snapshot expiry (Iceberg's expire_snapshots) and small-file
  * compaction (rewrite_data_files).
  */
object Maintenance {

  /** Drop all but the newest `keepLast` snapshots, then delete data
    * files that no surviving snapshot references. Returns the number
    * of files deleted. Metadata-only commit + physical delete AFTER
    * the commit point, so a crash mid-delete leaves only harmless
    * orphans (never a broken table).
    */
  def expireSnapshots(ops: TableOps, keepLast: Int): Int = {
    var attempts = 0
    while (true) {
      attempts += 1
      val (v, meta) = ops.refresh()
        .getOrElse(throw new IllegalStateException("no such table"))
      // ref-pinned snapshots (tags/branches) are never expired
      val pinned = meta.refs.values.map(_.snapshotId).toSet
      val kept = (meta.snapshots.sortBy(_.sequenceNumber).takeRight(keepLast) ++
        meta.snapshots.filter(s => pinned(s.snapshotId))).distinct
      if (kept.size == meta.snapshots.size) return 0
      val keptIds = kept.map(_.snapshotId).toSet
      val keptFiles = kept.flatMap(s => s.files.map(_.path) ++ s.deleteFiles.map(_.path)).toSet
      val orphans = meta.snapshots.filterNot(s => keptIds(s.snapshotId))
        .flatMap(s => s.files.map(_.path) ++ s.deleteFiles.map(_.path))
        .distinct.filterNot(keptFiles)
      val next = meta.copy(
        lastUpdatedMs = System.currentTimeMillis(),
        snapshots = kept,
        snapshotLog = meta.snapshotLog.filter(e => keptIds(e.snapshotId)))
      try {
        ops.commit(v, next)
        orphans.foreach(p =>
          Files.deleteIfExists(Paths.get(RelPaths.absolutize(ops.warehouse, p))))
        return orphans.size
      } catch {
        case _: CommitFailedException if attempts < 10 => // refresh + retry
      }
    }
    0
  }

  /** Create (or move) a named ref — `tag` pins a snapshot forever,
    * `branch` tracks it until moved (README.md:67-75 `refs`). Readable
    * through `VERSION AS OF '<name>'`.
    */
  def createRef(ops: TableOps, refName: String, refType: String = "tag",
      snapshotId: Option[Long] = None): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      val (v, meta) = ops.refresh()
        .getOrElse(throw new IllegalStateException("no such table"))
      val sid = snapshotId.orElse(meta.currentSnapshotId)
        .getOrElse(throw new IllegalStateException("table has no snapshot"))
      require(meta.snapshot(sid).isDefined, s"unknown snapshot $sid")
      try {
        ops.commit(v, meta.copy(
          lastUpdatedMs = System.currentTimeMillis(),
          refs = meta.refs + (refName -> graft.meta.Ref(sid, refType))))
        done = true
      } catch {
        case _: CommitFailedException if attempts < 10 =>
      }
    }
  }

  /** Write-audit-publish: append `df` to a named BRANCH — `main` (and
    * every reader not asking for the branch) is untouched until
    * [[fastForward]] publishes it.
    */
  def appendToBranch(table: GraftTable, df: org.apache.spark.sql.DataFrame,
      branch: String): Unit =
    Writer.append(table, df, overwrite = false, branch = Some(branch))

  /** Publish a branch: point `main` (the current snapshot) at the
    * branch head.
    */
  def fastForward(ops: TableOps, branch: String): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      val (v, meta) = ops.refresh()
        .getOrElse(throw new IllegalStateException("no such table"))
      val head = meta.refs.getOrElse(branch,
        throw new IllegalArgumentException(s"no branch $branch")).snapshotId
      val now = System.currentTimeMillis()
      try {
        ops.commit(v, meta.copy(
          lastUpdatedMs = now,
          currentSnapshotId = Some(head),
          snapshotLog = meta.snapshotLog :+ graft.meta.SnapshotLogEntry(now, head),
          refs = meta.refs + ("main" -> graft.meta.Ref(head, "branch"))))
        done = true
      } catch {
        case _: CommitFailedException if attempts < 10 =>
      }
    }
  }

  /** Rewrite the current snapshot into `targetFiles` files (an
    * `overwrite` snapshot — old files stay readable for time travel
    * until expireSnapshots reclaims them). Position deletes are APPLIED
    * by the rewrite and cleared from the new snapshot — compaction is
    * the copy-on-write settlement path for merge-on-read deletes.
    */
  def compact(spark: SparkSession, table: GraftTable, targetFiles: Int = 1): Unit = {
    val snap = table.readSnapshot
    val files = snap.map(_.files).getOrElse(Nil)
    if (files.isEmpty) return
    val paths = files.map(f => RelPaths.absolutize(table.ops.warehouse, f.path))
    val df = Mor.applyDeletes(spark,
        spark.read
          .schema(graft.meta.TableMeta.schemaToSpark(table.meta.schema))
          .parquet(paths: _*),
        table.ops.warehouse, snap.map(_.deleteFiles).getOrElse(Nil))
      .coalesce(targetFiles)
    Writer.append(table, df, overwrite = true,
      validateFrom = Some(snap.map(_.snapshotId)),
      clearDeletes = true)
  }
}
