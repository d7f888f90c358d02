package graft.catalog

import java.io.{InputStream, OutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** String-path warehouse IO — the seam that makes a non-posix
  * warehouse work (ref HadoopRelativeCatalog.java:84-91 resolves one
  * FileSystem per warehouse URI; RelativeFileIO.java delegates all
  * byte IO to it). Plain posix paths (`/tmp/wh`) keep the exact
  * java.nio behavior the repo always had; any scheme URI (`file://`,
  * `hdfs://`, `s3a://`…) routes through the Hadoop FileSystem
  * resolved from the path. Every metadata / maintenance byte that is
  * NOT written by a Spark job goes through here; Spark scans/writes
  * take the same absolute strings natively.
  *
  * All paths are ABSOLUTE strings — callers absolutize with
  * [[graft.meta.RelPaths]] first.
  */
object Io {

  def hasScheme(p: String): Boolean = p.contains(":/")

  /** Canonical spelling for scheme paths (Hadoop renders `file:///x`
    * as `file:/x`): normalizing at the warehouse boundary keeps
    * RelPaths prefix-matching consistent with every Path.toString
    * Hadoop hands back (listings, input_file_name, …). */
  def normalize(p: String): String =
    if (hasScheme(p)) new HPath(new java.net.URI(p)).toString else p

  /** Conf used to resolve warehouse FileSystems: the active Spark
    * session's (picks up spark.hadoop.* overrides — custom schemes,
    * credentials), falling back to a bare Configuration off-session. */
  def hadoopConf(): Configuration =
    try org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    catch { case _: Throwable => new Configuration() }

  def fs(p: String): FileSystem = new HPath(p).getFileSystem(hadoopConf())

  def exists(p: String): Boolean =
    if (hasScheme(p)) fs(p).exists(new HPath(p)) else Files.exists(Paths.get(p))

  def isDir(p: String): Boolean =
    if (hasScheme(p)) Try(fs(p).getFileStatus(new HPath(p)).isDirectory).getOrElse(false)
    else Files.isDirectory(Paths.get(p))

  def mkdirs(p: String): Unit =
    if (hasScheme(p)) { fs(p).mkdirs(new HPath(p)): Unit }
    else { Files.createDirectories(Paths.get(p)): Unit }

  def size(p: String): Long =
    if (hasScheme(p)) fs(p).getFileStatus(new HPath(p)).getLen
    else Files.size(Paths.get(p))

  def mtimeMs(p: String): Long =
    if (hasScheme(p)) fs(p).getFileStatus(new HPath(p)).getModificationTime
    else Files.getLastModifiedTime(Paths.get(p)).toMillis

  def inputStream(p: String): InputStream =
    if (hasScheme(p)) fs(p).open(new HPath(p))
    else Files.newInputStream(Paths.get(p))

  /** Create/overwrite `p`, creating parent dirs. */
  def outputStream(p: String): OutputStream =
    if (hasScheme(p)) fs(p).create(new HPath(p), true)
    else {
      val pp = Paths.get(p)
      if (pp.getParent != null) Files.createDirectories(pp.getParent)
      Files.newOutputStream(pp)
    }

  def readString(p: String): String =
    if (hasScheme(p)) {
      val in = inputStream(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } else Files.readString(Paths.get(p))

  def writeString(p: String, s: String): Unit =
    if (hasScheme(p)) {
      val out = outputStream(p)
      try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } else { Files.writeString(Paths.get(p), s): Unit }

  /** Atomic-as-available move that must NOT clobber `dst`: returns
    * false when `dst` already exists or the rename lost a race. The
    * commit CAS (ref renameToFinal:346-376) = lock + exists + this. */
  def renameNoReplace(src: String, dst: String): Boolean =
    if (hasScheme(src)) {
      val f = fs(src)
      if (f.exists(new HPath(dst))) false else f.rename(new HPath(src), new HPath(dst))
    } else {
      if (Files.exists(Paths.get(dst))) false
      else {
        Files.move(Paths.get(src), Paths.get(dst), StandardCopyOption.ATOMIC_MOVE)
        true
      }
    }

  /** Replace-allowed move (version hint). Best-effort atomic: nio uses
    * ATOMIC_MOVE+REPLACE; Hadoop deletes then renames (the hint is
    * advisory — refresh() falls back to the recovery scan anyway). */
  def renameReplace(src: String, dst: String): Unit =
    if (hasScheme(src)) {
      val f = fs(src)
      f.delete(new HPath(dst), false)
      f.rename(new HPath(src), new HPath(dst)): Unit
    } else {
      Files.move(Paths.get(src), Paths.get(dst),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
    }

  def deleteIfExists(p: String): Boolean =
    if (hasScheme(p)) Try(fs(p).delete(new HPath(p), false)).getOrElse(false)
    else Files.deleteIfExists(Paths.get(p))

  /** Quiet recursive delete (staging cleanup, where a leftover temp dir
    * is harmless). PURGE paths use [[deleteRecursiveChecked]] instead —
    * a swallowed failure there silently reports a successful purge
    * while leaving the data behind. */
  def deleteRecursiveQuietly(p: String): Unit =
    if (hasScheme(p)) { Try(fs(p).delete(new HPath(p), true)): Unit }
    else { org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)): Unit }

  /** Recursive delete that THROWS when the target survives (permission
    * or transient remote-FS failures): DROP ... PURGE must not report
    * success with the data still on disk. */
  def deleteRecursiveChecked(p: String): Unit = {
    if (hasScheme(p)) {
      if (!fs(p).delete(new HPath(p), true) && fs(p).exists(new HPath(p)))
        throw new java.io.IOException(s"recursive delete failed for $p")
    } else {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
    }
  }

  /** Immediate child NAMES of a directory (empty when absent). */
  def listNames(p: String): Seq[String] =
    if (hasScheme(p)) {
      if (!exists(p)) Nil
      else fs(p).listStatus(new HPath(p)).toSeq.map(_.getPath.getName)
    } else {
      val pp = Paths.get(p)
      if (!Files.isDirectory(pp)) Nil
      else {
        val st = Files.list(pp)
        try st.iterator().asScala.map(_.getFileName.toString).toList
        finally st.close()
      }
    }

  /** Immediate child directory/file ABSOLUTE paths. */
  def listPaths(p: String): Seq[String] =
    if (hasScheme(p)) {
      if (!exists(p)) Nil
      else fs(p).listStatus(new HPath(p)).toSeq.map(_.getPath.toString)
    } else listNames(p).map(n => s"${p.stripSuffix("/")}/$n")

  /** Recursive walk: absolute paths of all regular FILES under `p`. */
  def walkFiles(p: String): Seq[String] =
    if (hasScheme(p)) {
      if (!exists(p)) Nil
      else {
        val it = fs(p).listFiles(new HPath(p), true)
        val buf = scala.collection.mutable.ListBuffer.empty[String]
        while (it.hasNext) { val s = it.next(); if (s.isFile) buf += s.getPath.toString }
        buf.toList
      }
    } else {
      val root = Paths.get(p)
      if (!Files.isDirectory(root)) Nil
      else {
        val st = Files.walk(root)
        try st.iterator().asScala.filter(Files.isRegularFile(_)).map(_.toString).toList
        finally st.close()
      }
    }
}

/** Pluggable lock around the commit rename — the seam the reference
  * fills with an Iceberg LockManager (HadoopRelativeTableOperations
  * .renameToFinal:346-376 double-guards lock + exists + rename).
  * `entity` is the rename target, `owner` the committer's temp file.
  */
trait CommitLock {
  def acquire(entity: String, owner: String): Boolean
  def release(entity: String, owner: String): Boolean
}

object CommitLock {
  /** Schemes whose rename is copy-based or otherwise NOT an atomic
    * no-replace CAS — the commit race these stores lose silently is
    * exactly what the reference's LockManager exists for
    * (HadoopRelativeTableOperations.java:346-376). */
  private val nonAtomicRenameSchemes =
    Set("s3a", "s3", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss")

  /** Resolve from properties: `commit.lock-impl` names a zero-arg
    * CommitLock class (the distributed-lock hook); otherwise posix and
    * file:// warehouses get the single-node FileLock guard and remote
    * schemes rely on rename-no-replace (atomic on HDFS; NOT on
    * s3a/gs/abfs-style object stores — those must supply a lock impl,
    * and get a loud warning here rather than silent lost-commit risk).
    */
  def from(warehouse: String, props: java.util.Map[String, String]): CommitLock = {
    val impl = Option(props.get("commit.lock-impl"))
    impl match {
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor().newInstance().asInstanceOf[CommitLock]
      case None =>
        val scheme = if (Io.hasScheme(warehouse)) warehouse.takeWhile(_ != ':') else "file"
        if (scheme == "file") new FileCommitLock
        else {
          if (nonAtomicRenameSchemes(scheme))
            System.err.println(s"[graft] WARNING: warehouse scheme '$scheme' has no " +
              "atomic no-replace rename; concurrent commits can silently lose one. " +
              "Set commit.lock-impl (and commit.rename-atomic=false) for safe commits.")
          NoopCommitLock
        }
    }
  }
}

/** No lock: rename-no-replace is the CAS (HDFS & friends). */
object NoopCommitLock extends CommitLock {
  override def acquire(entity: String, owner: String): Boolean = true
  override def release(entity: String, owner: String): Boolean = true
}

/** Single-node commit guard: an OS file lock on `.commit.lock` next to
  * the rename target — serializes local committers across JVMs exactly
  * like the pre-seam implementation (posix and file:// warehouses,
  * where a local rename would silently replace an existing target).
  */
class FileCommitLock extends CommitLock {
  // channel per in-flight acquire, keyed by (entity, owner): a shared
  // instance under concurrent acquires must not let a losing thread
  // clobber the winner's channel (that leaked the OS lock for the JVM
  // lifetime and bricked every later commit to the table)
  private val held =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.nio.channels.FileChannel]

  private def lockPathFor(entity: String): java.nio.file.Path = {
    val noScheme =
      if (entity.startsWith("file:")) new HPath(entity).toUri.getPath else entity
    Paths.get(noScheme).getParent.resolve(".commit.lock")
  }

  override def acquire(entity: String, owner: String): Boolean = {
    var ch: java.nio.channels.FileChannel = null
    try {
      val p = lockPathFor(entity)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      ch = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
      ch.lock() // blocks until acquired; released via close()
      held.put((entity, owner), ch)
      true
    } catch {
      // same-JVM contention surfaces as OverlappingFileLockException —
      // report acquire failure so the committer retries on a fresh base
      case _: Throwable =>
        if (ch != null) Try(ch.close())
        false
    }
  }

  override def release(entity: String, owner: String): Boolean = {
    val ch = held.remove((entity, owner))
    if (ch != null) Try(ch.close())
    true
  }
}
