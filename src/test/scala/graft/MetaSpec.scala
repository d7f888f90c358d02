package graft

import graft.meta._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Pure-metadata properties (SURVEY §5.3): relativize∘absolutize = id
  * (spec: RelativeFileIO.java:31-40) and metadata JSON round-trip.
  */
class MetaSpec extends AnyFunSuite {

  private val segment = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val relPath = Gen.nonEmptyListOf(segment).map(_.mkString("/"))
  private val whouse = Gen.nonEmptyListOf(segment).map(_.mkString("/", "/", ""))

  private def forAll2(ga: Gen[String], gb: Gen[String])(f: (String, String) => Unit): Unit =
    (1 to 200).foreach { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong)
      for {
        a <- ga.apply(Gen.Parameters.default, seed)
        b <- gb.apply(Gen.Parameters.default, seed.next)
      } f(a, b)
    }

  test("relativize . absolutize = id for warehouse-relative paths") {
    forAll2(whouse, relPath) { (wh, p) =>
      assert(RelPaths.relativize(wh, RelPaths.absolutize(wh, p)) == p)
    }
  }

  test("absolutize leaves absolute and scheme paths untouched") {
    forAll2(whouse, relPath) { (wh, p) =>
      assert(RelPaths.absolutize(wh, "/" + p) == "/" + p)
      assert(RelPaths.absolutize(wh, "s3://bucket/" + p) == "s3://bucket/" + p)
    }
  }

  test("metadata JSON round-trips losslessly") {
    val m = TableMeta(
      formatVersion = 2, tableUuid = "u-1", location = "ns/t",
      lastSequenceNumber = 2, lastUpdatedMs = 123L, lastColumnId = 3,
      currentSchemaId = 0,
      schemas = List(SchemaDef(0, List(
        FieldDef(1, "id", "\"long\"", required = true),
        FieldDef(2, "data", "\"string\"", required = false)))),
      defaultSpecId = 0,
      partitionSpecs = List(PartSpec(0, List(PartField(1, 1000, "id", "identity")))),
      lastPartitionId = 1000,
      defaultSortOrderId = 0,
      sortOrders = List(SortOrderDef(0, List(SortField(1, "asc", "nulls-first")))),
      properties = Map("k" -> "v"),
      currentSnapshotId = Some(77L),
      snapshots = List(Snapshot(77L, None, 1, 5L, "append", Map("n" -> "1"),
        List(DataFile("ns/t/data/x.parquet", 10, 100,
          Map("id" -> "3"), Map("id" -> "1"), Map("id" -> "9"))))),
      snapshotLog = List(SnapshotLogEntry(5L, 77L)),
      metadataLog = List(MetadataLogEntry(5L, "ns/t/metadata/v1.metadata.json")),
      refs = Map("main" -> Ref(77L, "branch")))
    assert(TableMeta.fromJson(TableMeta.toJson(m)) == m)
  }

  test("spark schema mapping preserves names, types, nullability") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType),
      StructField("c", ArrayType(DoubleType)),
      StructField("d", MapType(StringType, IntegerType)),
      StructField("e", TimestampNTZType)))
    val back = TableMeta.schemaToSpark(TableMeta.schemaFromSpark(st))
    // names/types/nullability round-trip; the mapping ADDS field-id
    // metadata (parquet.field.id) that drives id-based read resolution
    assert(back.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
      st.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
    assert(back.fields.zipWithIndex.forall { case (f, i) =>
      f.metadata.getLong(TableMeta.FieldIdKey) == i + 1L })
  }
}
