package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable maintenance procedures (Spark 4 `CALL` statement over
  * the DSv2 `ProcedureCatalog` — the user-facing surface Iceberg ships
  * as `CALL cat.system.<proc>(...)`):
  *
  * {{{
  *   CALL cat.system.expire_snapshots(tbl => 'ns.t', keep_last => 3)
  *   CALL cat.system.compact_binpack(tbl => 'ns.t', target_size_bytes => 134217728)
  *   CALL cat.system.rollback_to_snapshot(tbl => 'ns.t', snapshot_id => 123)
  * }}}
  *
  * Each wraps the corresponding [[Maintenance]] API and returns a
  * one-row result set through a driver-side [[LocalScan]] (procedure
  * outputs are metadata-sized).
  */
object Procedures {

  private case class ProcDef(
      name: String,
      params: Seq[ProcedureParameter],
      out: StructType,
      run: (RelativeCatalog, InternalRow) => Seq[InternalRow])

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def tbl(cat: RelativeCatalog, t: String): GraftTable = {
    val parts = t.split('.')
    cat.loadTable(Identifier.of(parts.init, parts.last)).asInstanceOf[GraftTable]
  }

  private def row(vals: Any*): Seq[InternalRow] =
    Seq(new GenericInternalRow(vals.toArray))

  private val defs: Seq[ProcDef] = Seq(
    ProcDef("expire_snapshots",
      Seq(in("tbl", StringType), inDefault("keep_last", IntegerType, "1")),
      StructType(Seq(StructField("deleted_files", IntegerType))),
      (cat, args) => row(
        Maintenance.expireSnapshots(tbl(cat, args.getUTF8String(0).toString).ops,
          args.getInt(1)))),

    ProcDef("expire_older_than",
      Seq(in("tbl", StringType), in("older_than_ms", LongType)),
      StructType(Seq(StructField("deleted_files", IntegerType))),
      (cat, args) => row(
        Maintenance.expireOlderThan(tbl(cat, args.getUTF8String(0).toString).ops,
          args.getLong(1)))),

    ProcDef("remove_orphan_files",
      Seq(in("tbl", StringType), inDefault("older_than_ms", LongType, "0")),
      StructType(Seq(StructField("deleted_files", IntegerType))),
      (cat, args) => row(
        Maintenance.removeOrphanFiles(tbl(cat, args.getUTF8String(0).toString).ops,
          args.getLong(1)))),

    ProcDef("compact",
      Seq(in("tbl", StringType), inDefault("target_files", IntegerType, "1")),
      StructType(Seq(StructField("files_after", IntegerType))),
      (cat, args) => {
        val t = tbl(cat, args.getUTF8String(0).toString)
        Maintenance.compact(SparkSession.active, t, args.getInt(1))
        row(tbl(cat, args.getUTF8String(0).toString)
          .readSnapshot.map(_.dataFileCount).getOrElse(0))
      }),

    ProcDef("compact_binpack",
      Seq(in("tbl", StringType), in("target_size_bytes", LongType),
        inDefault("min_input_files", IntegerType, "2")),
      StructType(Seq(StructField("rewritten_files", IntegerType))),
      (cat, args) => row(
        Maintenance.compactBinpack(SparkSession.active,
          tbl(cat, args.getUTF8String(0).toString), args.getLong(1), args.getInt(2)))),

    ProcDef("rewrite_manifests",
      Seq(in("tbl", StringType)),
      StructType(Seq(StructField("rewritten_chunks", IntegerType))),
      (cat, args) => row(
        Maintenance.rewriteManifests(tbl(cat, args.getUTF8String(0).toString).ops))),

    ProcDef("rewrite_position_deletes",
      Seq(in("tbl", StringType), inDefault("target_files", IntegerType, "1"),
        inDefault("min_input_files", IntegerType, "2")),
      StructType(Seq(StructField("consolidated_files", IntegerType))),
      (cat, args) => row(
        Maintenance.rewritePositionDeletes(SparkSession.active,
          tbl(cat, args.getUTF8String(0).toString), args.getInt(1), args.getInt(2)))),

    ProcDef("rollback_to_snapshot",
      Seq(in("tbl", StringType), in("snapshot_id", LongType)),
      StructType(Seq(StructField("current_snapshot_id", LongType))),
      (cat, args) => {
        Maintenance.rollbackTo(tbl(cat, args.getUTF8String(0).toString).ops,
          args.getLong(1))
        row(args.getLong(1))
      }),

    ProcDef("cherrypick_snapshot",
      Seq(in("tbl", StringType), in("snapshot_id", LongType)),
      StructType(Seq(StructField("current_snapshot_id", LongType))),
      (cat, args) => {
        val t = tbl(cat, args.getUTF8String(0).toString)
        Maintenance.cherryPick(t, args.getLong(1))
        row(tbl(cat, args.getUTF8String(0).toString)
          .meta.currentSnapshotId.getOrElse(-1L))
      }),

    // write-audit-publish by id: writes staged under spark.wap.id
    // (write.wap.enabled tables) become the table state exactly once
    ProcDef("publish_changes",
      Seq(in("tbl", StringType), in("wap_id", StringType)),
      StructType(Seq(StructField("published_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType))),
      (cat, args) => {
        val t = tbl(cat, args.getUTF8String(0).toString)
        val wapId = args.getUTF8String(1).toString
        val staged = t.meta.snapshots
          .find(_.summary.get("wap.id").contains(wapId))
          .map(_.snapshotId).getOrElse(-1L)
        val cur = Maintenance.publishChanges(t, wapId)
        row(staged, cur)
      }),

    ProcDef("create_ref",
      Seq(in("tbl", StringType), in("ref", StringType),
        inDefault("ref_type", StringType, "'tag'"),
        // <= 0 means "no ref-level retention" (the table's
        // history.expire.max-ref-age-ms default still applies)
        inDefault("max_ref_age_ms", LongType, "0")),
      StructType(Seq(StructField("snapshot_id", LongType))),
      (cat, args) => {
        val t = tbl(cat, args.getUTF8String(0).toString)
        Maintenance.createRef(t.ops, args.getUTF8String(1).toString,
          args.getUTF8String(2).toString,
          maxRefAgeMs = Some(args.getLong(3)).filter(_ > 0))
        row(tbl(cat, args.getUTF8String(0).toString)
          .meta.refs(args.getUTF8String(1).toString).snapshotId)
      }),

    ProcDef("drop_ref",
      Seq(in("tbl", StringType), in("ref", StringType)),
      StructType(Seq(StructField("dropped", StringType))),
      (cat, args) => {
        Maintenance.dropRef(tbl(cat, args.getUTF8String(0).toString).ops,
          args.getUTF8String(1).toString)
        row(UTF8String.fromString(args.getUTF8String(1).toString))
      }),

    ProcDef("fast_forward",
      Seq(in("tbl", StringType), in("branch", StringType)),
      StructType(Seq(StructField("current_snapshot_id", LongType))),
      (cat, args) => {
        Maintenance.fastForward(tbl(cat, args.getUTF8String(0).toString).ops,
          args.getUTF8String(1).toString)
        row(tbl(cat, args.getUTF8String(0).toString)
          .meta.currentSnapshotId.getOrElse(-1L))
      }),

    ProcDef("update_spec",
      // transforms: 'col:identity,ts:months,id:bucket[8]'
      Seq(in("tbl", StringType), in("transforms", StringType)),
      StructType(Seq(StructField("spec_id", IntegerType))),
      (cat, args) => {
        val t = tbl(cat, args.getUTF8String(0).toString)
        val specs = args.getUTF8String(1).toString.split(',').toList.map { p =>
          p.split(':') match {
            case Array(c, tr) => (c.trim, tr.trim)
            case Array(c) => (c.trim, "identity")
            case _ => throw new IllegalArgumentException(s"bad transform '$p'")
          }
        }
        Maintenance.updateSpec(t, specs)
        row(tbl(cat, args.getUTF8String(0).toString).meta.defaultSpecId)
      }),

    ProcDef("compact_zorder",
      Seq(in("tbl", StringType), in("z_columns", StringType),
        inDefault("target_files", IntegerType, "1")),
      StructType(Seq(StructField("files_after", IntegerType))),
      (cat, args) => {
        val t = tbl(cat, args.getUTF8String(0).toString)
        Maintenance.compactZOrder(SparkSession.active, t,
          args.getUTF8String(1).toString.split(',').toSeq.map(_.trim),
          args.getInt(2))
        row(tbl(cat, args.getUTF8String(0).toString)
          .readSnapshot.map(_.dataFileCount).getOrElse(0))
      }),

    ProcDef("verify_table",
      Seq(in("tbl", StringType)),
      StructType(Seq(StructField("problems", IntegerType),
        StructField("detail", StringType))),
      (cat, args) => {
        val issues = Maintenance.verifyIntegrity(
          tbl(cat, args.getUTF8String(0).toString).ops)
        row(issues.size,
          if (issues.isEmpty) UTF8String.fromString("ok")
          else UTF8String.fromString(issues.take(10).mkString("; ")))
      }),

    ProcDef("compute_stats",
      Seq(in("tbl", StringType)),
      StructType(Seq(StructField("total_records", LongType))),
      (cat, args) => {
        val t = tbl(cat, args.getUTF8String(0).toString)
        Maintenance.computeStats(SparkSession.active, t)
        row(tbl(cat, args.getUTF8String(0).toString)
          .meta.statistics.map(_.totalRecords).getOrElse(0L))
      }),

    ProcDef("rollback_to_timestamp",
      Seq(in("tbl", StringType), in("timestamp_ms", LongType)),
      StructType(Seq(StructField("current_snapshot_id", LongType))),
      (cat, args) => row(
        Maintenance.rollbackToTimestamp(
          tbl(cat, args.getUTF8String(0).toString).ops, args.getLong(1)))),

    // rollbackTo accepts ANY retained snapshot (not just ancestors of
    // current), which is exactly Iceberg's set_current_snapshot; the
    // separate name keeps user scripts portable
    ProcDef("set_current_snapshot",
      Seq(in("tbl", StringType), in("snapshot_id", LongType)),
      StructType(Seq(StructField("current_snapshot_id", LongType))),
      (cat, args) => {
        Maintenance.rollbackTo(tbl(cat, args.getUTF8String(0).toString).ops,
          args.getLong(1))
        row(args.getLong(1))
      }),

    // multi-row output: the lineage chain, newest first
    // (snapshot_id => 0 means "from the current snapshot")
    ProcDef("ancestors_of",
      Seq(in("tbl", StringType), inDefault("snapshot_id", LongType, "0")),
      StructType(Seq(
        StructField("snapshot_id", LongType),
        StructField("parent_id", LongType),
        StructField("timestamp_ms", LongType),
        StructField("operation", StringType),
        StructField("data_files", IntegerType))),
      (cat, args) => {
        val sid = Some(args.getLong(1)).filter(_ != 0L)
        Maintenance.ancestorsOf(
            tbl(cat, args.getUTF8String(0).toString).ops, sid).map { s =>
          new GenericInternalRow(Array[Any](
            s.snapshotId, s.parentId.map(Long.box).orNull, s.timestampMs,
            UTF8String.fromString(s.operation), s.dataFileCount))
        }
      }),

    ProcDef("add_files",
      Seq(in("tbl", StringType), in("source_dir", StringType)),
      StructType(Seq(StructField("added_files", IntegerType),
        StructField("table_files", IntegerType))),
      (cat, args) => {
        val added = Maintenance.addFiles(SparkSession.active,
          tbl(cat, args.getUTF8String(0).toString),
          args.getUTF8String(1).toString)
        row(added, tbl(cat, args.getUTF8String(0).toString)
          .readSnapshot.map(_.dataFileCount).getOrElse(0))
      }),

    ProcDef("register_table",
      Seq(in("tbl", StringType), in("metadata_location", StringType)),
      StructType(Seq(StructField("current_snapshot_id", LongType),
        StructField("total_data_files", IntegerType))),
      (cat, args) => cat match {
        case j: JdbcRelativeCatalog =>
          val parts = args.getUTF8String(0).toString.split('.')
          val t = j.registerTable(Identifier.of(parts.init, parts.last),
            args.getUTF8String(1).toString)
          row(t.meta.currentSnapshotId.getOrElse(-1L),
            t.readSnapshot.map(_.dataFileCount).getOrElse(0))
        case _ => throw new UnsupportedOperationException(
          "register_table applies to the JDBC catalog (a path-based " +
            "catalog locates tables by directory; an on-disk table under " +
            "the warehouse root IS registered)")
      }),

    // migrate: adopt an existing parquet directory as a NEW graft
    // table in one call — Iceberg's `migrate` re-based on this
    // catalog's relative-path model. The schema is INFERRED from the
    // parquet footers (all-nullable: later imports may omit columns),
    // the table is created unpartitioned at its identifier's location,
    // and the files import zero-copy through add_files' frozen name
    // mapping — no byte moves, O(files) footer reads, so migrating
    // 100 TB is a metadata operation. The source must live under the
    // warehouse (every path in this format is warehouse-relative). A
    // failed import rolls the created table back out.
    ProcDef("migrate",
      Seq(in("source_dir", StringType), in("tbl", StringType)),
      StructType(Seq(StructField("migrated_files_count", IntegerType),
        StructField("table_location", StringType))),
      (cat, args) => {
        val srcDir = args.getUTF8String(0).toString
        val dp = args.getUTF8String(1).toString.split('.')
        val ident = Identifier.of(dp.init, dp.last)
        val spark = SparkSession.active
        require(!srcDir.startsWith("/") && !srcDir.contains(":/"),
          s"source dir must be warehouse-relative: $srcDir")
        // '.', '..', and empty ('//') segments are refused outright:
        // absolutize does no normalization, so any of them would let a
        // path that FAILS the string-prefix check below resolve inside
        // the refused directory anyway
        require(!srcDir.split('/').exists(s => s == ".." || s == "." || s.isEmpty),
          s"source dir must not contain '..', '.', or empty segments: $srcDir")
        // a FAILED import rolls the created table back out with a
        // recursive purge — a source dir nested under the new table's
        // directory would be deleted with it, destroying the very
        // files the zero-copy migrate was adopting. Refuse up front.
        val tloc = cat.tableLocation(ident)
        require(srcDir != tloc && !srcDir.startsWith(s"$tloc/"),
          s"source dir $srcDir is inside the new table's directory $tloc; " +
            "a failed migrate would purge the source files with the table — " +
            "import from a sibling directory, or use add_files on an existing table")
        val abs = graft.meta.RelPaths.absolutize(cat.warehouse, srcDir)
        require(Io.exists(abs), s"source dir not found: $srcDir")
        // refuse k=v layouts BEFORE schema inference invents all-NULL
        // partition columns (shared guard — add_files enforces it too)
        Maintenance.requireNoHiveLayout(abs)
        val inferred = spark.read.parquet(abs).schema
        val schema = StructType(inferred.fields.map(_.copy(nullable = true)))
        cat.createTable(ident, schema,
          Array.empty[org.apache.spark.sql.connector.expressions.Transform],
          new java.util.HashMap[String, String]())
        val t = cat.loadTable(ident).asInstanceOf[GraftTable]
        val n =
          try Maintenance.addFiles(spark, t, srcDir)
          catch { case e: Throwable => cat.dropTable(ident); throw e }
        row(n, UTF8String.fromString(t.meta.location))
      }),

    // zero-copy dev copy — Iceberg's `snapshot` procedure: a new
    // independent table referencing the source's current files in
    // place (gc.enabled=false guards expiry on the copy)
    ProcDef("snapshot",
      Seq(in("source_tbl", StringType), in("tbl", StringType)),
      StructType(Seq(StructField("current_snapshot_id", LongType),
        StructField("total_data_files", IntegerType))),
      (cat, args) => {
        val sp = args.getUTF8String(0).toString.split('.')
        val dp = args.getUTF8String(1).toString.split('.')
        val t = cat.snapshotTable(Identifier.of(sp.init, sp.last),
          Identifier.of(dp.init, dp.last))
        row(t.meta.currentSnapshotId.getOrElse(-1L),
          t.readSnapshot.map(_.dataFileCount).getOrElse(0))
      }),

    // temp-view wrapper over the `t$changes` CDC source — Iceberg's
    // create_changelog_view; downstream SQL then reads the view like a
    // table (per-commit insert/delete rows with _change_type/_change_ordinal)
    ProcDef("create_changelog_view",
      Seq(in("tbl", StringType), inDefault("view_name", StringType, "'changes_view'"),
        inDefault("start_snapshot_id", LongType, "1"),
        // compute_updates: pair per-commit delete+insert rows into
        // update_preimage/update_postimage by these identifier columns
        // (comma-separated), cancelling copy-on-write carry-over pairs
        // first — Iceberg's create_changelog_view(compute_updates)
        inDefault("identifier_columns", StringType, "''")),
      StructType(Seq(StructField("view_name", StringType))),
      (cat, args) => {
        val t = args.getUTF8String(0).toString
        val view = args.getUTF8String(1).toString
        val parts = t.split('.')
        val qualified = (cat.name() +: parts.init :+ s"`${parts.last}$$changes`").mkString(".")
        val raw = SparkSession.active.read
          .option("start-snapshot-id", args.getLong(2).toString)
          .table(qualified)
        val idCols = args.getUTF8String(3).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val out = if (idCols.isEmpty) raw else Changes.computeUpdates(raw, idCols)
        out.createOrReplaceTempView(view)
        row(UTF8String.fromString(view))
      }),
  )

  def names: Seq[String] = defs.map(_.name)

  def load(cat: RelativeCatalog, name: String): Option[UnboundProcedure] =
    defs.find(_.name == name).map { d =>
      new UnboundProcedure {
        override def name(): String = d.name
        override def description(): String = s"graft maintenance procedure ${d.name}"
        override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
          override def name(): String = d.name
          override def description(): String = s"graft maintenance procedure ${d.name}"
          override def parameters(): Array[ProcedureParameter] = d.params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            java.util.List.of[Scan](new LocalScan {
              private val result = d.run(cat, input).toArray
              override def rows(): Array[InternalRow] = result
              override def readSchema(): StructType = d.out
            }).iterator()
        }
      }
    }
}
