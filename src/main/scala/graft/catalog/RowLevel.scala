package graft.catalog

import graft.meta.{DataFile, RelPaths, TableMeta}
import java.nio.file.{Files, Paths}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.GraftFilterShim
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Group-based (copy-on-write) UPDATE / MERGE INTO / DELETE support —
  * the Spark row-level-operation API over our snapshot format.
  *
  * Contract: the operation's scan determines the replaced "groups".
  * Our scan prunes the file list with the pushed predicates (min/max
  * bounds) but reports every predicate as residual and pushes NOTHING
  * into parquet — Spark must see every row of the affected files to
  * write the unmatched ones back. Files the predicate provably cannot
  * touch are carried over into the replacement commit untouched, so a
  * MERGE over one partition never rewrites the other 99 (the property
  * that keeps COW affordable at 100 TB).
  */
class GraftRowLevelOperation(table: GraftTable, info: RowLevelOperationInfo)
  extends RowLevelOperation {

  @volatile private[catalog] var carryover: Seq[DataFile] = Nil

  /** `_file`-keyed runtime group filtering applies when the partition-
    * column variant cannot (no identity partition columns to filter
    * on) and the scan is plain COW (a MOR scratch rewrite loses file
    * identity). The scan then emits `_file` per row and the dynamic
    * filter prunes by exact file identity — which gives a MERGE on an
    * UNPARTITIONED (or days/bucket) table the same
    * only-rewrite-matched-files economics the partitioned case gets.
    */
  private[catalog] val useFileGroups: Boolean = {
    val spec = table.meta.spec.fields
    val hasIdentity = spec.exists(_.transform == "identity")
    val snap = table.readSnapshot
    val deletes = snap.map(_.deleteFiles).getOrElse(Nil)
    // worth paying the per-file planning + row-based readers only when
    // there are enough files for runtime pruning to skip some — a 1-3
    // file table rewrites cheaper through the vectorized path
    val enoughFiles = snap.map(_.dataFileCount).getOrElse(0) >= 4
    !hasIdentity && deletes.isEmpty && enoughFiles
  }

  override def command(): RowLevelOperation.Command = info.command()

  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (useFileGroups)
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))
    else Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RowLevelScanBuilder(table, options, this)

  override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new GraftBatchWrite(table,
        command().toString.toLowerCase, () => carryover, writeInfo.schema())
    }
}

class RowLevelScanBuilder(table: GraftTable, options: CaseInsensitiveStringMap,
    op: GraftRowLevelOperation)
  extends ScanBuilder with SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private val spark = org.apache.spark.sql.SparkSession.active
  private var exprs: Seq[Expression] = Nil
  private var required: StructType = table.schema()

  // every predicate stays residual: rows of affected files must all
  // survive the scan for write-back
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    exprs = filters
    filters
  }

  override def pushedFilters: Array[Predicate] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val snap = table.readSnapshot
    // full list: the untouched complement becomes the carryover set
    val files = snap.map(table.ops.allFiles).getOrElse(Nil)
    val v1 = exprs.flatMap(e => GraftFilterShim.translate(e))
    val (affected, untouched) = files.partition(f =>
      v1.forall(FilePruning.keepFile(f, _)))
    op.carryover = untouched
    val deletes = snap.map(_.deleteFiles).getOrElse(Nil)
    // add_files imports (no parquet field ids) can't go through the
    // raw-path delegate below — it reads with the id-annotated schema;
    // they take the scratch-materialize route with everything else
    val hasMapped = affected.exists(_.nameMapped.contains(true))
    if (op.useFileGroups && deletes.isEmpty && !hasMapped)
      return new FileGroupScan(table, options, required, affected, untouched, op)
    if (deletes.isEmpty && !hasMapped) {
      val rtCols = RowLevelScanBuilder.runtimeFilterCols(table, affected)
      if (rtCols.nonEmpty)
        return new GroupFilterScan(table, options, required, affected, untouched, rtCols, op)
    }
    // sized from the manifest: native files carry exact committed
    // lengths; the scratch branch below just wrote its files, so one
    // listing of the scratch dir replaces ParquetTable's per-path
    // re-listing of the whole affected set
    val knownFiles: Seq[(String, Long)] =
      if (deletes.isEmpty && !hasMapped)
        affected.map(f => (RelPaths.absolutize(table.ops.warehouse, f.path), f.bytes))
      else {
        // merge-on-read table: the rewrite must not resurrect deleted
        // rows, but the row-level planner can't serve a V1 fallback
        // scan (GroupBasedRowLevelOperationScanPlanning never wraps
        // V1Scans) — so materialize the delete-applied affected rows
        // to a scratch dir and scan that through the regular
        // vectorized delegate. Cost is one extra copy of the AFFECTED
        // files only (the carryover majority is untouched).
        val scratch = Files.createTempDirectory("graft_mor_rewrite")
        val sch = table.schema()
        Mor.applyDeletes(spark,
            Mor.readData(spark, table.ops.warehouse, sch, affected,
              table.meta.nameMapping,
              if (deletes.nonEmpty) Mor.withPositions(_, table.ops.warehouse)
              else identity),
            table.ops.warehouse, deletes, affected)
          // re-stamp field-id metadata (a name-mapped read strips it)
          // so the scratch files resolve by id like any native file
          .select(sch.fields.map(f =>
            org.apache.spark.sql.functions.col(f.name).as(f.name, f.metadata))
            .toIndexedSeq: _*)
          .write.mode("overwrite").parquet(scratch.toString)
        scala.jdk.CollectionConverters.IteratorHasAsScala(
            Files.list(scratch).iterator()).asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => (p.toString, Files.size(p))).toSeq.sortBy(_._1)
      }
    val delegate = org.apache.spark.sql.execution.datasources.GraftManifestIndex
      .parquetScanBuilder(spark, options, table.schema(), knownFiles)
    delegate.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(required)
    delegate.build()
  }
}

object RowLevelScanBuilder {
  /** Columns usable for RUNTIME group filtering of a COW rewrite
    * (Spark's RowLevelOperationRuntimeGroupFiltering over
    * SupportsRuntimeV2Filtering): a MERGE's matched groups are only
    * known once the SOURCE is evaluated, so Spark feeds the distinct
    * matched values of these columns back as an `In` predicate and the
    * scan drops (→ carries over) every file they prove untouched — the
    * property that keeps a single-partition MERGE on a 1000-partition
    * 100 TB table from rewriting the other 999.
    *
    * SAFETY. The rule also inserts the same `In` as a ROW filter in the
    * rewrite query, so a kept file whose rows don't all pass it would
    * silently lose the non-matching rows on write-back. File-level
    * pruning therefore has to agree EXACTLY with row-level membership,
    * which holds only when every affected file is single-valued with
    * zero nulls on every filter column. We claim columns iff:
    *   - identity partition-spec sources (the write path clusters rows
    *     by the spec, so files are partition-local by construction);
    *   - a type whose string-encoded bounds compare exactly
    *     (numeric/string/date/timestamp — FilePruning's safe set);
    *   - every affected file proves min == max and nullCount == 0
    *     (absent bounds or unknown null counts disqualify).
    * Any other shape returns Nil and the operation falls back to the
    * statically-pruned scan — never wrong, just less pruned.
    */
  def runtimeFilterCols(table: GraftTable, affected: Seq[DataFile]): Seq[String] = {
    val meta = table.meta
    val spark = TableMeta.schemaToSpark(meta.schema)
    val safe = meta.spec.fields.filter(_.transform == "identity").flatMap { pf =>
      meta.schema.fields.find(_.id == pf.sourceId).map(_.name)
    }.filter { name =>
      spark.fields.find(_.name == name).exists(_.dataType match {
        case _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType |
             _: org.apache.spark.sql.types.ShortType | _: org.apache.spark.sql.types.ByteType |
             _: org.apache.spark.sql.types.DoubleType | _: org.apache.spark.sql.types.FloatType |
             _: org.apache.spark.sql.types.StringType | _: org.apache.spark.sql.types.DateType |
             _: org.apache.spark.sql.types.TimestampType => true
        case _ => false
      })
    }
    val uniform = safe.filter { c =>
      affected.forall { f =>
        f.nullCount.get(c).contains(0L) &&
          f.minBound.get(c).exists(mn => f.maxBound.get(c).contains(mn))
      }
    }
    if (uniform.isEmpty || affected.isEmpty) Nil else uniform
  }
}

/** The COW rewrite scan with runtime group filtering: a V2 batch scan
  * over the affected files that accepts the optimizer's dynamic
  * `In(partition_col, matched values)` predicate and converts it into
  * file-level carryover before planning input partitions (see
  * [[RowLevelScanBuilder.runtimeFilterCols]] for the exactness
  * argument). Partition planning rebuilds the parquet delegate on each
  * call so a `filter()` arriving between plannings is always honored.
  */
class GroupFilterScan(table: GraftTable, options: CaseInsensitiveStringMap,
    required: StructType, initialAffected: Seq[DataFile], untouched: Seq[DataFile],
    filterCols: Seq[String], op: GraftRowLevelOperation)
  extends Scan with org.apache.spark.sql.connector.read.Batch
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  @volatile private var files: Seq[DataFile] = initialAffected

  override def readSchema(): StructType = required

  override def toBatch: org.apache.spark.sql.connector.read.Batch = this

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    filterCols.map(org.apache.spark.sql.connector.expressions.Expressions.column(_)).toArray

  override def filter(predicates: Array[Predicate]): Unit = {
    val v1 = predicates.flatMap(p => GraftFilterShim.toV1(p))
    // the optimizer applies the SAME predicate as a row filter in the
    // rewrite query regardless of what we prune — a predicate we can't
    // interpret would silently drop its rows from the write-back, so
    // fail loudly instead
    if (v1.length != predicates.length)
      throw new IllegalStateException(
        s"untranslatable runtime group filter ${predicates.mkString(",")}; " +
          "refusing to run a rewrite that could drop rows")
    if (v1.nonEmpty) {
      // files are value-uniform on every filter column (build-time
      // guard), so keepFile's bound check IS exact set membership here
      val kept = initialAffected.filter(f => v1.forall(FilePruning.keepFile(f, _)))
      files = kept
      val keptPaths = kept.map(_.path).toSet
      op.carryover = untouched ++ initialAffected.filterNot(f => keptPaths(f.path))
    }
  }

  private def delegate: Scan = {
    val spark = org.apache.spark.sql.SparkSession.active
    val sb = org.apache.spark.sql.execution.datasources.GraftManifestIndex
      .parquetScanBuilder(spark, options, table.schema(),
        files.map(f => (RelPaths.absolutize(table.ops.warehouse, f.path), f.bytes)))
    sb.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(required)
    sb.build()
  }

  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] =
    if (files.isEmpty) Array.empty else delegate.toBatch.planInputPartitions()

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    delegate.toBatch.createReaderFactory()
}

/** V2 BatchWrite: executors stream InternalRows straight into parquet
  * files under the table's data dir via Spark's ParquetWriteSupport;
  * the driver collects per-file stats and commits the replacement
  * snapshot through the OCC protocol.
  */
/** Cluster the write by the partition-spec transforms and sort within
  * tasks by them + the table sort order — the V2 analog of the append
  * path's repartition+sortWithinPartitions. This is what keeps written
  * files PARTITION-LOCAL (one partition value per file), which both
  * preserves tight min/max bounds for file skipping and upholds the
  * value-uniformity invariant that runtime group filtering depends on
  * ([[RowLevelScanBuilder.runtimeFilterCols]]). Non-identity
  * transforms (days/bucket) resolve through the catalog's
  * FunctionCatalog ([[GraftFunctions]]) when Spark plans the shuffle
  * key. Shared by the COW rewrite and the DELTA write.
  */
trait PartitionedWriteLayout extends RequiresDistributionAndOrdering {
  def table: GraftTable

  override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution = {
    val exprs = specV2Exprs
    if (exprs.isEmpty)
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    else
      org.apache.spark.sql.connector.distributions.Distributions.clustered(exprs.toArray)
  }

  /** Partition transforms lead the ordering (so same-partition rows
    * are CONTIGUOUS within each task and the fanout writer rolls
    * exactly once per partition value), then the table sort order. */
  override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    val specCols = specV2Exprs.map(e => Expressions.sort(e, SortDirection.ASCENDING))
    val sortCols = table.meta.sortOrders.find(_.orderId == table.meta.defaultSortOrderId)
      .map(_.fields).getOrElse(Nil).flatMap { sf =>
        table.meta.schema.fields.find(_.id == sf.sourceId).map { src =>
          Expressions.sort(Expressions.column(src.name),
            if (sf.direction == "desc") SortDirection.DESCENDING else SortDirection.ASCENDING)
        }
      }
    (specCols ++ sortCols).toArray
  }

  private def specV2Exprs: Seq[org.apache.spark.sql.connector.expressions.Expression] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    table.meta.spec.fields.flatMap { pf =>
      table.meta.schema.fields.find(_.id == pf.sourceId).map { src =>
        pf.transform match {
          case "days" => Expressions.days(src.name)
          case "years" => Expressions.years(src.name)
          case "months" => Expressions.months(src.name)
          case "hours" => Expressions.hours(src.name)
          case t if t.startsWith("bucket[") =>
            Expressions.bucket(t.stripPrefix("bucket[").stripSuffix("]").toInt, src.name)
          case t if t.startsWith("truncate[") =>
            Expressions.apply("truncate",
              Expressions.literal(t.stripPrefix("truncate[").stripSuffix("]").toInt),
              Expressions.column(src.name))
          case _ => Expressions.column(src.name)
            : org.apache.spark.sql.connector.expressions.Expression
        }
      }
    }
  }

  /** Fanout roll keys for the write schema (transform-aware). */
  protected def specKeySpecs(schema: StructType): Seq[KeySpec] =
    KeySpec.forSpec(table, schema)
}

class GraftBatchWrite(val table: GraftTable, operation: String,
    carryover: () => Seq[DataFile],
    writeSchema: StructType = null) extends Write with BatchWrite
  with PartitionedWriteLayout {

  // the replace query may carry extra (metadata) columns; write what
  // Spark hands us. The plan-derived schema can lose our field-id
  // metadata, so re-stamp it by name from the table schema — every
  // data file must carry ids for id-based read resolution.
  private val schema = {
    val base = Option(writeSchema).getOrElse(table.schema())
    val metaByName = table.schema().fields.map(f => f.name -> f.metadata).toMap
    StructType(base.fields.map(f =>
      metaByName.get(f.name).map(m => f.copy(metadata = m)).getOrElse(f)))
  }
  private val stagingRel = s"${table.meta.location}/data/${java.util.UUID.randomUUID()}"
  private val stagingAbs = RelPaths.absolutize(table.ops.warehouse, stagingRel)

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Io.mkdirs(stagingAbs)
    // session-derived hadoop conf: carries every SQL conf
    // ParquetWriteSupport.init expects (rebase modes, legacy format,
    // timestamp type, …)
    val conf = Writer.writerHadoopConf(org.apache.spark.sql.SparkSession.active, schema,
      Writer.bloomColumns(table.meta))
    // partitioned tables: roll to a new file whenever the partition
    // key changes (input is clustered + ordered by it via
    // RequiresDistributionAndOrdering), keeping rewritten files
    // partition-local
    new GraftDataWriterFactory(stagingAbs, new SerializableConfiguration(conf), schema,
      keyFromEnd = specKeySpecs(schema), dataLeading = false,
      targetBytes = Writer.targetFileSize(table.meta))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val written = messages.collect { case m: GraftCommitMessage if m.records > 0 => m }
    val fileKeys = written.flatMap(_.fileKeys).toMap
    val specNames = table.meta.spec.fields.map(_.name)
    // stats over the TABLE schema subset (bounds drive file skipping)
    val newFiles =
      if (written.isEmpty) Nil
      else Writer.collectStats(spark, table.schema(), table.ops.warehouse, stagingAbs)
        .filter(_.records > 0)
        .map(f => Writer.stampPartition(f, fileKeys, specNames, table.ops.warehouse))
    // a conflicted commit must not leak the staged rewrite as orphans
    try Writer.commitSnapshot(table, newFiles, overwrite = true,
      operation = operation, carryover = carryover(),
      validateFrom = Some(table.readSnapshot.map(_.snapshotId)),
      wapId = Writer.sessionWapId(table.meta))
    catch {
      case e: Throwable =>
        Io.deleteRecursiveQuietly(stagingAbs)
        throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    Io.deleteRecursiveQuietly(stagingAbs): Unit
}

case class GraftCommitMessage(records: Long,
    fileKeys: List[(String, List[String])] = Nil) extends WriterCommitMessage

/** One partition-key field for the fanout writer, addressed as an
  * offset from the END of the incoming record — end-relative because
  * the record can carry a variable number of rewrite-internal leading
  * columns (V2 path) or one trailing computed key column (V1 append
  * path), and only the distance from the end is stable in both.
  * [[DaysKey]]/[[BucketKey]] apply the partition TRANSFORM executor-
  * side (same definitions as [[GraftFunctions]]), so two timestamps of
  * the same day don't force a file roll.
  */
sealed trait KeySpec extends Serializable {
  def fromEnd: Int
  def dt: org.apache.spark.sql.types.DataType
  def eval(record: InternalRow, ordinal: Int): AnyRef
  /** Canonical string form(s) of an evaluated key — one per partition
    * field (the V1 path's single struct key carries them all). Stamped
    * into `DataFile.partition` so per-file partition tuples survive
    * into the metadata (what bucket-spec SPJ reads, since bucket
    * membership is not provable from value bounds). */
  def repr(value: AnyRef): Seq[String] = value match {
    case null => Seq("null")
    case r: InternalRow => dt match {
      case st: StructType => st.fields.indices.map { i =>
        if (r.isNullAt(i)) "null" else String.valueOf(r.get(i, st.fields(i).dataType))
      }
      case _ => Seq(String.valueOf(r))
    }
    case v => Seq(String.valueOf(v))
  }
}

object KeySpec {
  /** Transform-aware fanout roll keys for a write schema: one per
    * partition-spec field whose source column appears in `schema`. */
  def forSpec(table: GraftTable, schema: StructType): Seq[KeySpec] =
    table.meta.spec.fields.flatMap { pf =>
      table.meta.schema.fields.find(_.id == pf.sourceId).flatMap { src =>
        schema.fields.zipWithIndex.find(_._1.name == src.name).map { case (f, i) =>
          val fromEnd = schema.length - i
          pf.transform match {
            case "days" => DaysKey(fromEnd, f.dataType)
            case "years" => TimePartKey(fromEnd, f.dataType, "years")
            case "months" => TimePartKey(fromEnd, f.dataType, "months")
            case "hours" => HoursKey(fromEnd, f.dataType)
            case t if t.startsWith("bucket[") =>
              BucketKey(fromEnd, f.dataType,
                t.stripPrefix("bucket[").stripSuffix("]").toInt)
            case t if t.startsWith("truncate[") =>
              TruncateKey(fromEnd, f.dataType,
                t.stripPrefix("truncate[").stripSuffix("]").toInt)
            case _ => RawKey(fromEnd, f.dataType)
          }
        }
      }
    }
}
case class RawKey(fromEnd: Int, dt: org.apache.spark.sql.types.DataType) extends KeySpec {
  override def eval(record: InternalRow, ordinal: Int): AnyRef =
    record.get(ordinal, dt) match {
      // values may point into a reused row buffer — copy what we hold
      case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
      case r: InternalRow => r.copy()
      case v => v
    }
}
case class DaysKey(fromEnd: Int, dt: org.apache.spark.sql.types.DataType) extends KeySpec {
  override def eval(record: InternalRow, ordinal: Int): AnyRef =
    if (record.isNullAt(ordinal)) null
    else GraftFunctions.daysOf(record.get(ordinal, dt), dt)
}
case class BucketKey(fromEnd: Int, dt: org.apache.spark.sql.types.DataType,
    n: Int) extends KeySpec {
  override def eval(record: InternalRow, ordinal: Int): AnyRef =
    Integer.valueOf(GraftFunctions.bucketOf(
      if (record.isNullAt(ordinal)) null else record.get(ordinal, dt), dt, n))
}
case class TimePartKey(fromEnd: Int, dt: org.apache.spark.sql.types.DataType,
    part: String) extends KeySpec {
  override def eval(record: InternalRow, ordinal: Int): AnyRef =
    if (record.isNullAt(ordinal)) null
    else if (part == "years") GraftFunctions.yearsOf(record.get(ordinal, dt), dt)
    else GraftFunctions.monthsOf(record.get(ordinal, dt), dt)
}
case class HoursKey(fromEnd: Int, dt: org.apache.spark.sql.types.DataType) extends KeySpec {
  override def eval(record: InternalRow, ordinal: Int): AnyRef =
    if (record.isNullAt(ordinal)) null
    else GraftFunctions.hoursOf(record.get(ordinal, dt), dt)
}
case class TruncateKey(fromEnd: Int, dt: org.apache.spark.sql.types.DataType,
    w: Int) extends KeySpec {
  override def eval(record: InternalRow, ordinal: Int): AnyRef =
    if (record.isNullAt(ordinal)) null
    else GraftFunctions.truncateOf(record.get(ordinal, dt), dt, w) match {
      // UTF8String may point into a reused buffer — copy what we hold
      case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
      case v => v
    }
}

class GraftDataWriterFactory(stagingAbs: String, conf: SerializableConfiguration,
    schema: StructType, keyFromEnd: Seq[KeySpec] = Nil,
    dataLeading: Boolean = false,
    targetBytes: Long = Long.MaxValue) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(stagingAbs, s"part-$partitionId-$taskId", conf.value, schema,
      keyFromEnd, dataLeading, targetBytes)
}

/** Fanout parquet writer (the clustered-writer pattern): input arrives
  * sorted by the partition key, and the writer ROLLS to a fresh file
  * whenever the key changes — so every data file holds exactly one
  * partition value (partition-local files → tight min/max bounds,
  * exact partition stats, and the uniformity invariant runtime group
  * filtering needs). One parquet writer open at a time, O(1) memory.
  */
class GraftDataWriter(dir: String, prefix: String, conf: Configuration,
    schema: StructType, keyFromEnd: Seq[KeySpec],
    dataLeading: Boolean,
    // roll to a fresh file once the open one's buffered+flushed size
    // passes this (`write.target-file-size-bytes`): a skewed 10 GB
    // partition lands as target-sized files, not one monolith. Files
    // stay partition-LOCAL — several files may share one partition
    // value, which every consumer (SPJ, stats, group filtering)
    // already handles.
    targetBytes: Long = Long.MaxValue) extends DataWriter[InternalRow] {

  private var count = 0L
  private var fileSeq = 0
  private var writer: ParquetWriter[InternalRow] = _
  private var curPath: String = _
  private var curCount = 0L
  private val written = scala.collection.mutable.ListBuffer.empty[String]
  private val fileKeys = scala.collection.mutable.Map.empty[String, List[String]]
  private var prevKey: Array[AnyRef] = _
  private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _

  /** (path → partition-value strings) for every non-empty file. */
  def writtenFileKeys: Map[String, List[String]] =
    fileKeys.view.filterKeys(written.contains).toMap

  private def openNext(): Unit = {
    curPath = s"$dir/$prefix-$fileSeq.parquet"; fileSeq += 1; curCount = 0
    class B(p: Path) extends ParquetWriter.Builder[InternalRow, B](p) {
      override def self(): B = this
      override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
        new ParquetWriteSupport
    }
    val builder = new B(new Path(curPath))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.ZSTD)
    // ParquetWriter.Builder ignores ParquetOutputFormat's per-column
    // conf keys — translate `parquet.bloom.filter.enabled#col`
    // (stamped by Writer.writerHadoopConf from the table property)
    // into the explicit builder calls
    import scala.jdk.CollectionConverters._
    val bloomPrefix = "parquet.bloom.filter.enabled#"
    conf.asScala.foreach { e =>
      if (e.getKey.startsWith(bloomPrefix))
        builder.withBloomFilterEnabled(
          e.getKey.substring(bloomPrefix.length), e.getValue.toBoolean): Unit
    }
    writer = builder.build()
    written += curPath
  }

  private def closeCurrent(): Unit = if (writer != null) {
    writer.close()
    if (curCount == 0) { deleteFile(curPath); written -= curPath }
    writer = null
  }

  private def keyOf(record: InternalRow): Array[AnyRef] =
    keyFromEnd.map(k => k.eval(record, record.numFields - k.fromEnd)).toArray

  override def write(record: InternalRow): Unit = {
    if (keyFromEnd.nonEmpty) {
      val k = keyOf(record)
      if (prevKey == null || !prevKey.indices.forall(i =>
          java.util.Objects.equals(prevKey(i), k(i)))) {
        closeCurrent(); openNext(); prevKey = k
        fileKeys(curPath) = keyFromEnd.zip(k).flatMap { case (ks, v) => ks.repr(v) }.toList
      }
    } else if (writer == null) openNext()
    val out =
      if (record.numFields == schema.length) record
      else {
        if (proj == null) {
          val ords =
            if (dataLeading) 0 until schema.length
            else (record.numFields - schema.length) until record.numFields
          proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(schema, ords.toIndexedSeq)
        }
        proj.project(record)
        proj
      }
    writer.write(out); count += 1; curCount += 1
    if (targetBytes != Long.MaxValue && (curCount & 1023) == 0 &&
        writer.getDataSize > targetBytes) {
      closeCurrent(); openNext()
      if (prevKey != null)
        fileKeys(curPath) = keyFromEnd.zip(prevKey).flatMap {
          case (ks, v) => ks.repr(v) }.toList
    }
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    GraftCommitMessage(count, writtenFileKeys.toList)
  }

  override def abort(): Unit = {
    scala.util.Try(if (writer != null) writer.close())
    written.foreach(deleteFile)
  }

  /** Executor-safe delete: scheme paths go through the task's Hadoop
    * conf (credentials!), posix through java.nio. */
  private def deleteFile(p: String): Unit =
    if (Io.hasScheme(p)) { scala.util.Try(new Path(p).getFileSystem(conf).delete(new Path(p), false)): Unit }
    else { Files.deleteIfExists(Paths.get(p)): Unit }

  override def close(): Unit = ()
}

/** DELTA row-level operation (merge-on-read UPDATE / MERGE / DELETE,
  * selected by `write.<cmd>.mode=merge-on-read`): instead of rewriting
  * every affected file group, the write emits POSITION DELETES for the
  * touched rows plus data files for the new row versions. A
  * 10-row UPDATE on a 100 TB table costs O(10 rows written), not a
  * whole-file rewrite per touched file — the format-v2 CDC/upsert
  * economics. Row identity is the scan-provided (`_file`, `_pos`)
  * metadata pair, encoded exactly like committed delete files
  * ([[Mor.relFileCol]]), so scan-side subtraction always agrees.
  */
class GraftDeltaOperation(table: GraftTable, info: RowLevelOperationInfo)
  extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): RowLevelOperation.Command = info.command()

  // the delta scan is just the table scan (with _file/_pos served as
  // metadata columns); unlike the group-based scan it CAN let filters
  // prune aggressively — unmatched rows are simply untouched
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(table, options)

  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"),
      org.apache.spark.sql.connector.expressions.Expressions.column("_pos"))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newWriteBuilder(writeInfo: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new GraftDeltaWrite(table, command().toString.toLowerCase, writeInfo.schema())
    }
}

class GraftDeltaWrite(val table: GraftTable, operation: String, rowSchema: StructType)
  extends org.apache.spark.sql.connector.write.DeltaWrite
  with org.apache.spark.sql.connector.write.DeltaBatchWrite
  with PartitionedWriteLayout {

  // re-stamp field ids by name (the plan-derived row schema loses them)
  private val schema = {
    val metaByName = table.schema().fields.map(f => f.name -> f.metadata).toMap
    StructType(rowSchema.fields.map(f =>
      metaByName.get(f.name).map(m => f.copy(metadata = m)).getOrElse(f)))
  }
  private val dataRel = s"${table.meta.location}/data/${java.util.UUID.randomUUID()}"
  private val dataAbs = RelPaths.absolutize(table.ops.warehouse, dataRel)
  private val delRel = s"${table.meta.location}/deletes/${java.util.UUID.randomUUID()}"
  private val delAbs = RelPaths.absolutize(table.ops.warehouse, delRel)

  override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
    Io.mkdirs(dataAbs)
    Io.mkdirs(delAbs)
    val spark = org.apache.spark.sql.SparkSession.active
    new GraftDeltaWriterFactory(dataAbs, delAbs,
      new SerializableConfiguration(Writer.writerHadoopConf(spark, schema,
        Writer.bloomColumns(table.meta))),
      new SerializableConfiguration(Writer.writerHadoopConf(spark, Mor.deleteSchema)),
      schema, specKeySpecs(schema))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val ms = messages.collect { case m: GraftDeltaMessage => m }
    val newFiles =
      if (ms.forall(_.dataRecords == 0)) Nil
      else Writer.collectStats(spark, table.schema(), table.ops.warehouse, dataAbs)
        .filter(_.records > 0)
        .map(f => Writer.stampPartition(f, ms.flatMap(_.fileKeys).toMap,
          table.meta.spec.fields.map(_.name), table.ops.warehouse))
    val delFiles =
      if (ms.forall(_.deleteRecords == 0)) Nil
      else Writer.collectStats(spark, Mor.deleteSchema, table.ops.warehouse, delAbs,
        exactBoundCols = Set("file_path"))
        .filter(_.records > 0)
    if (newFiles.isEmpty && delFiles.isEmpty) { abort(messages); return }
    // a concurrent rewrite/compaction of a file our deletes reference
    // would orphan those deletes → conflict on exactly that set
    val mustExist: Set[String] =
      if (delFiles.isEmpty) Set.empty
      else spark.read.schema(Mor.deleteSchema)
        .parquet(delFiles.map(f => RelPaths.absolutize(table.ops.warehouse, f.path)): _*)
        .select("file_path").distinct().collect().map(_.getString(0)).toSet
    try Writer.commitSnapshot(table, newFiles, overwrite = false,
      operation = operation, carryover = Nil,
      newDeletes = delFiles, mustExist = mustExist,
      wapId = Writer.sessionWapId(table.meta))
    catch {
      case e: Throwable =>
        Io.deleteRecursiveQuietly(dataAbs)
        Io.deleteRecursiveQuietly(delAbs)
        throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    Io.deleteRecursiveQuietly(dataAbs)
    Io.deleteRecursiveQuietly(delAbs): Unit
  }
}

case class GraftDeltaMessage(dataRecords: Long, deleteRecords: Long,
    fileKeys: List[(String, List[String])] = Nil) extends WriterCommitMessage

class GraftDeltaWriterFactory(dataDir: String, delDir: String,
    dataConf: SerializableConfiguration, delConf: SerializableConfiguration,
    schema: StructType, keySpecs: Seq[KeySpec])
  extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new GraftDeltaWriter(
      new GraftDataWriter(dataDir, s"part-$partitionId-$taskId", dataConf.value,
        schema, keySpecs, dataLeading = false),
      new GraftDataWriter(delDir, s"del-$partitionId-$taskId", delConf.value,
        Mor.deleteSchema, Nil, dataLeading = false))
}

/** Routes the WriteDelta stream: inserts (and the insert half of
  * updates) into the fanout data writer, deletes as (file, pos) rows
  * into the position-delete writer. */
class GraftDeltaWriter(dataW: GraftDataWriter, delW: GraftDataWriter)
  extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {

  private var dataN = 0L
  private var delN = 0L

  override def insert(row: InternalRow): Unit = { dataW.write(row); dataN += 1 }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    delW.write(id); delN += 1
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id); insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val dm = dataW.commit().asInstanceOf[GraftCommitMessage]
    delW.commit()
    GraftDeltaMessage(dataN, delN, dm.fileKeys)
  }

  override def abort(): Unit = { dataW.abort(); delW.abort() }

  override def close(): Unit = { dataW.close(); delW.close() }
}

/** The `_file`-keyed COW rewrite scan: a V2 batch scan that reads each
  * affected file through its own parquet delegate and APPENDS the
  * file's warehouse-relative path to every row (readSchema puts
  * `_file` LAST, so the append is a cheap JoinedRow — the relation's
  * output order follows readSchema). Runtime group filtering is then
  * EXACT by construction: the dynamic `In(_file, matched)` row filter
  * and the scan's file-level pruning key on the same identity, for any
  * partition layout — the generalization of [[GroupFilterScan]]'s
  * partition-column variant to unpartitioned/days/bucket tables.
  * Trade: per-file planning and row-based readers (no vectorization)
  * on the rewrite scan — paid only on the files that survive runtime
  * pruning, which is the point.
  */
class FileGroupScan(table: GraftTable, options: CaseInsensitiveStringMap,
    required: StructType, initialAffected: Seq[DataFile], untouched: Seq[DataFile],
    op: GraftRowLevelOperation)
  extends Scan with org.apache.spark.sql.connector.read.Batch
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  @volatile private var files: Seq[DataFile] = initialAffected

  // data columns only, `_file` re-appended LAST in the declared schema
  private val dataSchema = StructType(required.fields.filterNot(_.name == "_file"))

  override def readSchema(): StructType =
    StructType(dataSchema.fields :+
      org.apache.spark.sql.types.StructField("_file",
        org.apache.spark.sql.types.StringType, nullable = false))

  override def toBatch: org.apache.spark.sql.connector.read.Batch = this

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))

  override def filter(predicates: Array[Predicate]): Unit = {
    if (predicates.isEmpty) return
    val v1 = predicates.flatMap(p => GraftFilterShim.toV1(p))
    val wanted: Option[Set[String]] = v1.collectFirst {
      case org.apache.spark.sql.sources.In("_file", vs) =>
        vs.map(String.valueOf).toSet
      case org.apache.spark.sql.sources.EqualTo("_file", v) => Set(String.valueOf(v))
    }
    // see GroupFilterScan.filter: the same predicate filters ROWS in
    // the rewrite query, so an uninterpreted one must fail, not no-op
    val set = wanted.getOrElse(throw new IllegalStateException(
      s"untranslatable _file runtime filter ${predicates.mkString(",")}; " +
        "refusing to run a rewrite that could drop rows"))
    val kept = initialAffected.filter(f => set(f.path))
    files = kept
    val keptPaths = kept.map(_.path).toSet
    op.carryover = untouched ++ initialAffected.filterNot(f => keptPaths(f.path))
  }

  private def delegate(f: DataFile): Scan = {
    val spark = org.apache.spark.sql.SparkSession.active
    val sb = org.apache.spark.sql.execution.datasources.GraftManifestIndex
      .parquetScanBuilder(spark, options, table.schema(),
        Seq((RelPaths.absolutize(table.ops.warehouse, f.path), f.bytes)))
    sb.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(dataSchema)
    sb.build()
  }

  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] =
    files.flatMap { f =>
      delegate(f).toBatch.planInputPartitions()
        .map(p => FileTaggedPartition(f.path, p))
    }.toArray

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    val inner =
      if (files.isEmpty) null
      else delegate(files.head).toBatch.createReaderFactory()
    new AppendFileFactory(inner)
  }
}

case class FileTaggedPartition(relPath: String,
    inner: org.apache.spark.sql.connector.read.InputPartition)
  extends org.apache.spark.sql.connector.read.InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Row-based reader wrapper appending the partition's constant `_file`
  * value as the LAST column of every row. */
class AppendFileFactory(
    inner: org.apache.spark.sql.connector.read.PartitionReaderFactory)
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  override def supportColumnarReads(
      p: org.apache.spark.sql.connector.read.InputPartition): Boolean = false

  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val tagged = p.asInstanceOf[FileTaggedPartition]
    val delegate = inner.createReader(tagged.inner)
    val fileRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(tagged.relPath)))
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      override def next(): Boolean = delegate.next()
      override def get(): InternalRow = joined(delegate.get(), fileRow)
      override def close(): Unit = delegate.close()
    }
  }
}
