package graft.catalog

import graft.meta.{DataFile, RelPaths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Merge-on-read position deletes (spec: the reference's enabled
  * format-v2 surface, /root/reference/README.md:89-90
  * `total-position-deletes`).
  *
  * A DELETE in `merge-on-read` mode writes a parquet file of
  * (file_path STRING, pos BIGINT) — file_path warehouse-RELATIVE (the
  * reference's relocation invariant applies to delete files too), pos
  * the row's ordinal within that data file (`_metadata.row_index`).
  * Scans subtract the delete set with an anti-join on (file, pos);
  * compaction applies the deletes for real and clears them.
  *
  * Scale design: the delete side is broadcast when small (the normal
  * case — trickle deletes against a 100 TB table are KBs/day), else a
  * shuffled anti-join on (file, pos), which is skew-free because file
  * paths are high-cardinality. Data files are NEVER rewritten by a
  * MOR delete — that is the point: a trickle DELETE costs O(matched
  * rows), not O(table).
  */
object Mor {

  val deleteSchema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** broadcast the delete side below this many bytes (parquet size —
    * generous because the decoded two-column set stays small) */
  private val BroadcastMaxBytes: Long = 64L << 20

  /** `_metadata.file_path` (a file: URI) → warehouse-relative path,
    * the exact representation stored in delete files. Used identically
    * on the write and read sides so the anti-join keys always agree.
    */
  def relFileCol(warehouse: String): Column = {
    val w = if (warehouse.endsWith("/")) warehouse else warehouse + "/"
    // strip the URI scheme, then the warehouse prefix
    val noScheme = regexp_replace(col("_metadata.file_path"), "^file:(//)?", "")
    when(noScheme.startsWith(w), noScheme.substr(lit(w.length + 1), lit(Int.MaxValue)))
      .otherwise(noScheme)
  }

  /** The committed delete set as (__gf relative-path, __gp position). */
  def deleteSet(spark: SparkSession, warehouse: String,
      deletes: Seq[DataFile]): DataFrame = {
    val paths = deletes.map(d => RelPaths.absolutize(warehouse, d.path))
    val raw = spark.read.schema(deleteSchema).parquet(paths: _*)
      .select(col("file_path").as("__gf"), col("pos").as("__gp"))
    if (deletes.map(_.bytes).sum <= BroadcastMaxBytes) broadcast(raw) else raw
  }

  /** Annotate a parquet file-source DataFrame with its (relative file,
    * position) as __gf/__gp — materialized BEFORE any join so `_metadata`
    * never needs to resolve through one. */
  def withPositions(data: DataFrame, warehouse: String): DataFrame =
    data.withColumn("__gf", relFileCol(warehouse))
      .withColumn("__gp", col("_metadata.row_index"))

  /** Anti-join a __gf/__gp-annotated frame against the delete set;
    * keeps the annotation columns. */
  def subtract(spark: SparkSession, annotated: DataFrame, warehouse: String,
      deletes: Seq[DataFile]): DataFrame =
    if (deletes.isEmpty) annotated
    else annotated.join(deleteSet(spark, warehouse, deletes), Seq("__gf", "__gp"), "left_anti")

  /** Subtract `deletes` from `data` (a parquet file-source DataFrame
    * over this table's data files, so `_metadata` resolves). No-op when
    * the delete list is empty.
    */
  def applyDeletes(spark: SparkSession, data: DataFrame, warehouse: String,
      deletes: Seq[DataFile]): DataFrame =
    if (deletes.isEmpty) data
    else {
      val cols = data.columns
      subtract(spark, withPositions(data, warehouse), warehouse, deletes)
        .select(cols.map(col).toIndexedSeq: _*)
    }
}
