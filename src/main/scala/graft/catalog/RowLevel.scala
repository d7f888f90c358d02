package graft.catalog

import graft.meta.{DataFile, RelPaths}
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

  override def command(): RowLevelOperation.Command = info.command()

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
    val files = snap.map(_.files).getOrElse(Nil)
    val v1 = exprs.flatMap(e => GraftFilterShim.translate(e))
    val (affected, untouched) = files.partition(f =>
      v1.forall(FilePruning.keepFile(f, _)))
    op.carryover = untouched
    val deletes = snap.map(_.deleteFiles).getOrElse(Nil)
    val affectedAbs = affected.map(f => RelPaths.absolutize(table.ops.warehouse, f.path))
    val paths =
      if (deletes.isEmpty) affectedAbs
      else {
        // merge-on-read table: the rewrite must not resurrect deleted
        // rows, but the row-level planner can't serve a V1 fallback
        // scan (GroupBasedRowLevelOperationScanPlanning never wraps
        // V1Scans) — so materialize the delete-applied affected rows
        // to a scratch dir and scan that through the regular
        // vectorized delegate. Cost is one extra copy of the AFFECTED
        // files only (the carryover majority is untouched).
        val scratch = Files.createTempDirectory("graft_mor_rewrite")
        Mor.applyDeletes(spark,
            spark.read.schema(table.schema()).parquet(affectedAbs: _*),
            table.ops.warehouse, deletes, affected)
          .write.mode("overwrite").parquet(scratch.toString)
        Seq(scratch.toString)
      }
    val delegate = ParquetTable(table.name(), spark, options, paths,
      Some(table.schema()), classOf[ParquetFileFormat]).newScanBuilder(options)
    delegate.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(required)
    delegate.build()
  }
}

/** V2 BatchWrite: executors stream InternalRows straight into parquet
  * files under the table's data dir via Spark's ParquetWriteSupport;
  * the driver collects per-file stats and commits the replacement
  * snapshot through the OCC protocol.
  */
class GraftBatchWrite(table: GraftTable, operation: String,
    carryover: () => Seq[DataFile],
    writeSchema: StructType = null) extends Write with BatchWrite {

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
    Files.createDirectories(Paths.get(stagingAbs))
    // session-derived hadoop conf: carries every SQL conf
    // ParquetWriteSupport.init expects (rebase modes, legacy format,
    // timestamp type, …)
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, conf)
    // ParquetWriteSupport.init asserts these two are present — Spark's
    // own ParquetFileFormat.prepareWrite sets them the same way
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.binaryAsString", "false")
    conf.set("spark.sql.parquet.int96AsTimestamp", "true")
    conf.set("spark.sql.caseSensitive", "false")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    conf.set("spark.sql.parquet.fieldId.read.enabled", "false")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    new GraftDataWriterFactory(stagingAbs, new SerializableConfiguration(conf), schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val written = messages.collect { case m: GraftCommitMessage if m.records > 0 => m }
    // stats over the TABLE schema subset (bounds drive file skipping)
    val newFiles =
      if (written.isEmpty) Nil
      else Writer.collectStats(spark, table.schema(), table.ops.warehouse, stagingAbs)
        .filter(_.records > 0)
    // a conflicted commit must not leak the staged rewrite as orphans
    try Writer.commitSnapshot(table, newFiles, overwrite = true,
      operation = operation, carryover = carryover(),
      validateFrom = Some(table.readSnapshot.map(_.snapshotId)))
    catch {
      case e: Throwable =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stagingAbs))
        throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stagingAbs)): Unit
}

case class GraftCommitMessage(path: String, records: Long) extends WriterCommitMessage

class GraftDataWriterFactory(stagingAbs: String, conf: SerializableConfiguration,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(s"$stagingAbs/part-$partitionId-$taskId.parquet", conf.value, schema)
}

class GraftDataWriter(path: String, conf: Configuration,
    schema: StructType) extends DataWriter[InternalRow] {

  private var count = 0L
  private val writer: ParquetWriter[InternalRow] = {
    class B(p: Path) extends ParquetWriter.Builder[InternalRow, B](p) {
      override def self(): B = this
      override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
        new ParquetWriteSupport
    }
    new B(new Path(path))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.ZSTD)
      .build()
  }

  // the ReplaceData query can prepend rewrite-internal metadata
  // columns; the declared write schema always maps to the TRAILING
  // fields — project them out before handing parquet the row
  private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _

  override def write(record: InternalRow): Unit = {
    val out =
      if (record.numFields == schema.length) record
      else {
        if (proj == null) {
          val offset = record.numFields - schema.length
          proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(schema,
            (offset until record.numFields).toIndexedSeq)
        }
        proj.project(record)
        proj
      }
    writer.write(out); count += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (count == 0) Files.deleteIfExists(Paths.get(path))
    GraftCommitMessage(path, count)
  }

  override def abort(): Unit = {
    scala.util.Try(writer.close())
    Files.deleteIfExists(Paths.get(path))
  }

  override def close(): Unit = ()
}
