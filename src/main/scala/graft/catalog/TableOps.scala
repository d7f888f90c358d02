package graft.catalog

import graft.meta.{RelPaths, TableMeta}
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._
import scala.util.Try

class CommitFailedException(msg: String) extends RuntimeException(msg)

/** A concurrent commit changed files an in-flight row-level operation
  * (DELETE/UPDATE/MERGE/compact) had read — retrying would lose its
  * update, so the operation must fail (Iceberg validation semantics).
  * Deliberately NOT a [[CommitFailedException]]: the OCC retry loop
  * must not swallow it.
  */
class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Metadata refresh / OCC commit / crash recovery for one table —
  * the Spark-native analog of the reference's table operations
  * (HadoopRelativeTableOperations.java):
  *
  *  - versioned metadata chain `metadata/v<N>.metadata.json` plus a
  *    best-effort `version-hint.text` (ref :253-263, :278-281)
  *  - refresh: read hint, forward-scan to the newest version, parse,
  *    UUID continuity check (ref :96-141, checkUUID :79-85)
  *  - commit: stale-base check, no-absolute-path invariant, temp
  *    `<UUID>.metadata.json`, file-lock + exists-check + ATOMIC_MOVE
  *    rename to `v<N+1>` — the commit point; losers of the rename race
  *    get CommitFailedException and retry on a refreshed base
  *    (ref :144-180, renameToFinal :346-376)
  *  - findVersion crash recovery: if the hint is corrupt/missing, scan
  *    `v*.metadata.json` and take the max that parses (ref :302-337)
  *  - metadata GC: drop all but the newest K metadata files after a
  *    successful commit (ref deleteRemovedMetadataFiles :400-416)
  */
class TableOps(val warehouse: String, val tableLocation: String) {

  def tableDir: Path = Paths.get(RelPaths.absolutize(warehouse, tableLocation))
  def metadataDir: Path = tableDir.resolve("metadata")
  def versionHintFile: Path = metadataDir.resolve("version-hint.text")
  def metadataFile(v: Int): Path = metadataDir.resolve(s"v$v.metadata.json")

  @volatile private var cachedUuid: Option[String] = None

  /** Version-hint read with recovery scan fallback. 0 = table absent. */
  def findVersion(): Int = {
    val hinted = Try {
      Files.readString(versionHintFile).trim.toInt
    }.toOption.filter(v => v > 0 && Files.exists(metadataFile(v)))
    hinted.getOrElse {
      if (!Files.isDirectory(metadataDir)) 0
      else Files.list(metadataDir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".metadata.json") =>
          Try(s.stripPrefix("v").stripSuffix(".metadata.json").toInt).getOrElse(0)
        }
        .foldLeft(0)(math.max)
    }
  }

  /** Newest committed (version, metadata); None if the table doesn't exist. */
  def refresh(): Option[(Int, TableMeta)] = {
    var v = findVersion()
    if (v == 0) return None
    while (Files.exists(metadataFile(v + 1))) v += 1
    val meta = TableMeta.fromJson(Files.readString(metadataFile(v)))
    cachedUuid match {
      case Some(u) if u != meta.tableUuid =>
        throw new IllegalStateException(
          s"table UUID changed from $u to ${meta.tableUuid} (concurrent replace?)")
      case _ => cachedUuid = Some(meta.tableUuid)
    }
    Some((v, meta))
  }

  /** Commit `meta` as version `base + 1`. Throws CommitFailedException
    * when a concurrent committer won the rename race or `base` is stale.
    */
  def commit(base: Int, meta: TableMeta): Int = {
    val current = { var v = findVersion(); while (Files.exists(metadataFile(v + 1))) v += 1; v }
    if (base != current)
      throw new CommitFailedException(s"stale base: committed=$current, attempted base=$base")

    // Relocation invariant (ref :155-158): nothing absolute may reach
    // the metadata file, or a warehouse move would break the table.
    require(!meta.location.startsWith("/") && !meta.location.contains("://"),
      s"table location must be warehouse-relative: ${meta.location}")
    meta.snapshots.flatMap(s => s.files ++ s.deleteFiles).foreach { f =>
      require(!f.path.startsWith("/") && !f.path.contains("://"),
        s"data/delete file path must be warehouse-relative: ${f.path}")
    }

    Files.createDirectories(metadataDir)
    val target = metadataFile(base + 1)
    val tmp = metadataDir.resolve(s".${java.util.UUID.randomUUID()}.metadata.json")
    Files.writeString(tmp, TableMeta.toJson(meta))

    val lockFile = metadataDir.resolve(".commit.lock")
    val ch = FileChannel.open(lockFile, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try {
        if (Files.exists(target)) {
          Files.deleteIfExists(tmp)
          throw new CommitFailedException(s"version ${base + 1} already committed")
        }
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      } finally lock.release()
    } catch {
      case e: CommitFailedException => throw e
      case e: Throwable =>
        Files.deleteIfExists(tmp)
        throw new CommitFailedException(s"rename to $target failed: ${e.getMessage}")
    } finally ch.close()

    writeVersionHint(base + 1)
    gcOldMetadata(keep = 10)
    base + 1
  }

  /** Best-effort hint rewrite via temp + atomic replace (ref :283-300). */
  def writeVersionHint(v: Int): Unit = Try {
    val tmp = metadataDir.resolve(s".hint-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, versionHintFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def gcOldMetadata(keep: Int): Unit = Try {
    val vs = Files.list(metadataDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".metadata.json") =>
        Try(s.stripPrefix("v").stripSuffix(".metadata.json").toInt).getOrElse(0)
      }.toSeq.sorted
    vs.dropRight(keep).filter(_ > 0).foreach(v => Files.deleteIfExists(metadataFile(v)))
  }
}
