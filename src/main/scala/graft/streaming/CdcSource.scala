package graft.streaming

import graft.catalog.{Changes, TableOps}
import graft.meta.TableMeta
import org.apache.spark.sql.{DataFrame, GraftStreamShim, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Streaming CDC source: `spark.readStream.format("graft-cdc")
  * .option("table", "cat.ns.t")` (resolved through the session's
  * registered catalogs) or `.option("warehouse", wh)
  * .option("location", tblLoc)` tails a table's CHANGELOG — every commit (append, MOR/COW delete, update,
  * merge) becomes a micro-batch of rows tagged `_change_type`
  * ('insert' | 'delete') — where the DSv2 table-tail source
  * ([[graft.catalog.GraftMicroBatchStream]]) handles appends only.
  *
  * Offsets are commit SEQUENCE NUMBERS, so a batch is exactly the
  * change rows of the commits in (startSeq, endSeq], recomputed from
  * the snapshot chain by [[Changes.between]] — replayable from
  * metadata alone (exactly-once after a crash). If snapshot retention
  * does NOT cover the stream's lag — the restart offset's snapshot or
  * any chain ancestor has been expired — the batch THROWS instead of
  * silently re-emitting or dropping changes, and a mid-stream schema
  * change likewise fails the batch (restart to pick it up). The chain
  * is parent-lineage-walked, so commits after a `rollbackTo` diff
  * against their actual parent; rows from an abandoned lineage are
  * not retracted. A FRESH stream's genesis batch may diff past an
  * expired ancestor (synthetic genesis: the surviving state replays
  * as inserts), but a checkpointed REPLAY of batch 0 keeps the loud
  * truncation failure — option `allow-synthetic-genesis` overrides
  * the checkpoint-derived default either way.
  * `start-seq` (default 0) sets the initial offset:
  * 0 replays the whole table as genesis inserts, the current seq at
  * start gives a "changes from now on" tail.
  *
  * 100 TB shape: each trigger costs O(rows changed in the range) for
  * append/MOR traffic (the Changes fast paths read only added files
  * plus the delete-referenced parents); only COW row-level commits
  * pay an adjacent-state diff. The per-batch DataFrame is a full
  * Catalyst plan — joins, pruning and codegen all apply inside the
  * micro-batch.
  */
class GraftCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  /** Either `table` (a registered `catalog.ns.name`, resolved through
    * the session's catalog manager) or explicit `warehouse` +
    * `location`. */
  private def tableOps(ctx: SQLContext, params: Map[String, String]): TableOps =
    params.get("table") match {
      case Some(fqn) =>
        val parts = ctx.sparkSession.sessionState.sqlParser.parseMultipartIdentifier(fqn)
        require(parts.length >= 3,
          s"graft-cdc option 'table' needs catalog.ns.name, got '$fqn'")
        val cat = ctx.sparkSession.sessionState.catalogManager.catalog(parts.head)
        cat.asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
          .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.tail.init.toArray, parts.last)) match {
          case g: graft.catalog.GraftTable => g.ops
          case other => throw new IllegalArgumentException(
            s"graft-cdc: '$fqn' is not a graft table (${other.getClass.getName})")
        }
      case None =>
        val wh = params.getOrElse("warehouse",
          throw new IllegalArgumentException(
            "graft-cdc requires option 'table' (catalog.ns.name) or 'warehouse'+'location'"))
        val loc = params.getOrElse("location",
          throw new IllegalArgumentException(
            "graft-cdc requires option 'location' (table path relative to the warehouse)"))
        new TableOps(wh, loc)
    }

  private def loadMeta(ops: TableOps): TableMeta =
    ops.refresh().map(_._2).getOrElse(
      throw new IllegalArgumentException(
        s"no table at ${ops.tableDir} (missing metadata)"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), Changes.outputSchema(loadMeta(tableOps(ctx, parameters))))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val ops = tableOps(ctx, parameters)
    val startSeq = parameters.get("start-seq").map(_.toLong).getOrElse(0L)
    // Synthetic genesis (diffing past an expired ancestor on a
    // fromSeq=0 batch) is only deterministic-safe on a FRESH stream:
    // a checkpointed stream replaying batch 0 must see the same rows
    // it first delivered, which expiry can have collapsed. The
    // checkpoint itself says which case this is — metadataPath is
    // <ckpt>/sources/<i>, so offsets/0 present with commits/0 absent
    // means batch 0 was constructed but never committed and the next
    // getBatch(None, _) is a REPLAY. The explicit option overrides
    // both ways (an idempotent/net-state sink may opt in; a paranoid
    // append sink may opt out even for the fresh start).
    // the checkpoint root, when metadataPath has the standard
    // <ckpt>/sources/<i> layout (None = unrecognized layout)
    val ckptRoot = Option(new org.apache.hadoop.fs.Path(metadataPath).getParent)
      .filter(_.getName == "sources").flatMap(d => Option(d.getParent))
    def ckptHas(rel: String): Boolean = ckptRoot.exists { ckpt =>
      ckpt.getFileSystem(ctx.sparkSession.sessionState.newHadoopConf())
        .exists(new org.apache.hadoop.fs.Path(ckpt, rel))
    }
    // "an offset was WRITTEN", not "the offsets dir exists": the
    // engine mkdirs the dir lazily but possibly before the first
    // offset lands (and a long-running checkpoint purges offsets/0
    // under minBatchesToRetain, so the 0-file probe alone is wrong
    // the other way)
    def ckptHasAnyOffset: Boolean = ckptRoot.exists { ckpt =>
      val fs = ckpt.getFileSystem(ctx.sparkSession.sessionState.newHadoopConf())
      val dir = new org.apache.hadoop.fs.Path(ckpt, "offsets")
      fs.exists(dir) && fs.listStatus(dir).nonEmpty
    }
    val allowSynthetic = parameters.get("allow-synthetic-genesis") match {
      case Some(v) => v.toBoolean
      case None =>
        // The sniff trusts metadataPath = <ckpt>/sources/<i>. If the
        // layout ever differs (Spark version change, wrapped source),
        // the exists() probes would miss and the guard would silently
        // fail OPEN — so an unrecognized layout instead fails SAFE: no
        // synthetic genesis without the explicit opt-in (the genesis
        // walk then refuses loudly, telling the user to set
        // allow-synthetic-genesis if their sink really is idempotent).
        val pendingGenesisReplay = ckptHas("offsets/0") && !ckptHas("commits/0")
        ckptRoot.isDefined && !pendingGenesisReplay
    }
    // Rate caps start DISARMED on a RESTART (any offset written): a
    // V1 source's getOffset that returns below the committed offset
    // would regress the checkpoint and later re-deliver. In the normal
    // case Spark's restart recovery re-invokes getBatch with the
    // restored range (populateStartOffsets), which re-arms the cap
    // floor at the committed position BEFORE the first new trigger —
    // caps then apply immediately. The disarmed state is the
    // structural fallback for paths where no recovery getBatch
    // happens: that first trigger is uncapped but forward-only, never
    // regressing. A FRESH stream has nothing to regress: caps arm
    // immediately.
    val isRestart = ckptHasAnyOffset
    new GraftCdcSource(ctx.sparkSession, ops, loadMeta(ops), startSeq, allowSynthetic,
      maxCommitsPerTrigger = parameters.get("max-commits-per-trigger").map(_.toInt),
      maxRowsPerTrigger = parameters.get("max-rows-per-trigger").map(_.toLong),
      initialCapFloor = if (isRestart) None else Some(startSeq))
  }
}

class GraftCdcSource(spark: SparkSession, ops: TableOps,
    initialMeta: TableMeta, startSeq: Long,
    allowSyntheticGenesis: Boolean = true,
    maxCommitsPerTrigger: Option[Int] = None,
    maxRowsPerTrigger: Option[Long] = None,
    initialCapFloor: Option[Long] = Some(0L)) extends Source {

  // schema is pinned at stream start: mid-stream schema evolution must
  // not silently reshape batches (restart the query to pick it up)
  private val outSchema = Changes.outputSchema(initialMeta)

  private def freshMeta: TableMeta =
    ops.refresh().map(_._2).getOrElse(initialMeta)

  private def seqOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def schema: StructType = outSchema

  // Rate-cap floor: the highest offset this run has handed to the
  // engine (advanced by getBatch, which sees every range — replays
  // included). None = restart whose committed position is unknown
  // until the first getBatch: caps stay disarmed for that one trigger
  // because a capped offset BELOW the committed one would regress the
  // checkpoint and re-deliver (V1 sources have no start param in
  // getOffset). A forward-only uncapped batch is always safe.
  @volatile private var capFloor: Option[Long] = initialCapFloor

  /** Main-lineage snapshots in (above, head], oldest first — the
    * admissible units of a CDC batch (branch/WAP snapshots share the
    * seq space but never enter a main tail). */
  private def lineageAbove(meta: TableMeta, above: Long): List[graft.meta.Snapshot] = {
    val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
    val out = scala.collection.mutable.ListBuffer.empty[graft.meta.Snapshot]
    var cur = meta.currentSnapshot
    while (cur.exists(_.sequenceNumber > above)) {
      out += cur.get
      cur = cur.get.parentId.flatMap(byId.get)
    }
    out.toList.sortBy(_.sequenceNumber)
  }

  /** Admission control: cap each trigger at `max-commits-per-trigger`
    * main-lineage commits and/or `max-rows-per-trigger` rows — a
    * backlog then drains as bounded, replayable micro-batches.
    * Commit-granular on purpose: a CDC batch is a seq-range diff, so
    * a commit is the smallest replayable unit (the fromSeq=0 genesis
    * diff on an aged table is one such unit and cannot split — the
    * table-tail source's (seq, fileIdx) offsets are the file-granular
    * alternative for append-only tails). Row accounting under the
    * rows cap: appends count their EXACT added rows (manifest stats,
    * chunk-cached, only loaded when the rows cap is set); a row-level
    * commit's change-row count has no cheap upper bound (an equality
    * delete's stats count predicates, not rows), so it admits and then
    * CLOSES the batch — the cap can never be silently inert on
    * row-level history; `replace` (compaction) emits nothing and
    * passes through free. The admission walk is in-memory pointer
    * chasing over RETAINED snapshots (bounded by the table's retention
    * policy), already materialized by refresh. */
  override def getOffset: Option[OffsetV1] = {
    val meta = freshMeta
    val head = meta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
    if (head <= startSeq) return None
    val uncapped = maxCommitsPerTrigger.isEmpty && maxRowsPerTrigger.isEmpty
    capFloor match {
      case None => Some(LongOffset(head)) // restart fallback: one uncapped, forward-only trigger
      case _ if uncapped => Some(LongOffset(head))
      case Some(f) =>
        val base = math.max(f, startSeq)
        if (head <= base) return Some(LongOffset(base))
        val countRows = maxRowsPerTrigger.isDefined
        var n = 0; var rows = 0L; var end = base; var stop = false
        for (s <- lineageAbove(meta, base) if !stop) {
          val isAppend = s.operation == "append"
          val isReplace = s.operation == "replace"
          val r =
            if (countRows && isAppend) ops.addedFiles(s).map(_.records).sum
            else 0L
          val exceeds = maxCommitsPerTrigger.exists(n + 1 > _) ||
            maxRowsPerTrigger.exists(rows + r > _)
          if (exceeds && n > 0) stop = true
          else {
            n += 1; rows += r; end = s.sequenceNumber
            // row-level commit under a rows cap: unknown change-row
            // count — close the batch here (see doc above)
            if (countRows && !isAppend && !isReplace) stop = true
          }
        }
        Some(LongOffset(end))
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromSeq = start.map(seqOf).getOrElse(startSeq)
    val toSeq = seqOf(end)
    // re-arm the rate caps: every range the engine constructs or
    // replays passes through here, so max() is the committed frontier
    capFloor = Some(math.max(capFloor.getOrElse(Long.MinValue), toSeq))
    val meta = freshMeta
    // enforce the pinned-schema contract: MicroBatchExecution aliases
    // batch output to the stream-start attributes BY POSITION, so a
    // mid-stream column add/rename would silently mislabel data
    // instead of failing — refuse and tell the user to restart
    val cur = Changes.outputSchema(meta)
    if (cur != outSchema)
      throw new IllegalStateException(
        s"table schema changed mid-stream (was ${outSchema.simpleString}, " +
          s"now ${cur.simpleString}); restart the streaming query to pick " +
          "up the new schema")
    val batch = Changes
      .between(spark, ops.warehouse, ops, meta, fromSeq, toSeq,
        allowSyntheticGenesis = allowSyntheticGenesis)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(outSchema.fields.map(_.copy(nullable = true)))))
    GraftStreamShim.streamingFrom(batch)
  }

  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftCdcSource[${ops.tableDir}]"
}
