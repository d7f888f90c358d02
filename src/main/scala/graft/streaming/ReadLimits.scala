package graft.streaming

import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit,
  ReadAllAvailable, ReadLimit, ReadMaxFiles, ReadMaxRows}

/** The engine-visible rate-limit contract shared by both streaming
  * sources (the table tail and `graft-cdc`): a source ADVERTISES its
  * configured caps through `getDefaultReadLimit` and derives each
  * trigger's effective caps from the ReadLimit the engine PASSES to
  * `latestOffset(start, limit)` — the Kafka/Delta-source shape.
  * That round-trip is what makes the caps engine-visible (progress
  * metrics, composite AvailableNow limits) AND engine-overridable:
  * `Trigger.Once` passes `allAvailable()` expecting the whole backlog
  * in one batch, and honoring it here is what keeps that contract —
  * a source that re-applied its own caps would deliver one capped
  * batch and stop with backlog still owed.
  */
object ReadLimits {

  /** The ReadLimit to advertise for the configured caps: each cap in
    * its standard spelling (`maxFiles`/`maxRows`), the commits cap in
    * the custom [[CommitsPerTrigger]] (no built-in spelling exists),
    * composite when several are set, `allAvailable()` when none. */
  def configured(maxFiles: Option[Int], maxRows: Option[Long],
      maxCommits: Option[Int] = None): ReadLimit = {
    val parts: List[ReadLimit] =
      maxFiles.map(ReadLimit.maxFiles(_): ReadLimit).toList ++
        maxRows.map(ReadLimit.maxRows(_): ReadLimit).toList ++
        maxCommits.map(CommitsPerTrigger(_): ReadLimit).toList
    parts match {
      case Nil => ReadLimit.allAvailable()
      case one :: Nil => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** One trigger's effective (files, rows, commits) caps from the
    * engine-passed limit. `allAvailable()` means the engine asked for
    * the whole backlog — uncapped, ALL configured caps included (the
    * Trigger.Once contract). A limit kind this source never advertises
    * (`minRows`, `maxBytes`, a future addition) falls back to the
    * configured caps — fail-safe: an unrecognized request must never
    * silently drop the user's rate limit. The fail-safe covers
    * composites too: ONE unrecognized member fails the whole composite
    * back to the configured caps (the member could have been the
    * strictest cap — decoding only the recognized ones would drop it,
    * and a composite of ONLY unrecognized kinds would otherwise decode
    * to fully uncapped). */
  def caps(limit: ReadLimit, cfgFiles: Option[Int], cfgRows: Option[Long],
      cfgCommits: Option[Int]): (Option[Int], Option[Long], Option[Int]) =
    limit match {
      case null => (cfgFiles, cfgRows, cfgCommits)
      case c: CompositeReadLimit =>
        val decoded = c.getReadLimits.map(decodeOne)
        if (decoded.exists(_.isEmpty)) (cfgFiles, cfgRows, cfgCommits)
        else decoded.flatten.foldLeft(
          (Option.empty[Int], Option.empty[Long], Option.empty[Int])) { (acc, d) =>
          (acc._1.orElse(d._1), acc._2.orElse(d._2), acc._3.orElse(d._3))
        }
      case other =>
        decodeOne(other).getOrElse((cfgFiles, cfgRows, cfgCommits))
    }

  /** One non-composite limit kind → its cap contribution; None =
    * unrecognized (incl. a nested composite, which is never
    * advertised). `allAvailable` is recognized and contributes no cap
    * — inside a composite that member relaxes nothing the others
    * don't, standalone the caller gets fully uncapped. */
  private def decodeOne(
      l: ReadLimit): Option[(Option[Int], Option[Long], Option[Int])] = l match {
    case _: ReadAllAvailable => Some((None, None, None))
    case f: ReadMaxFiles => Some((Some(f.maxFiles), None, None))
    case r: ReadMaxRows => Some((None, Some(r.maxRows), None))
    case CommitsPerTrigger(n) => Some((None, None, Some(n)))
    case _ => None
  }
}

/** `max-commits-per-trigger` in ReadLimit form: [[ReadLimit]] is an
  * open interface precisely so sources can advertise cap kinds the
  * built-ins lack — the engine treats the object opaquely (it only
  * special-cases `allAvailable()` for Trigger.Once) and hands it back
  * to `latestOffset(start, limit)`, where [[ReadLimits.caps]] decodes
  * it. A CDC commit is the changelog's smallest replayable unit, so
  * its cap has no rows/files spelling. */
case class CommitsPerTrigger(commits: Int) extends ReadLimit
