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

  test("lineageWindowFrom: bounded walk, truncation report, loud parentId cycle") {
    def snap(id: Long, parent: Option[Long], seq: Long) =
      Snapshot(id, parent, seq, 0L, "append", Map.empty, Nil)
    def meta(snaps: List[Snapshot]) = TableMeta(
      formatVersion = 2, tableUuid = "u-lw", location = "ns/t",
      lastSequenceNumber = snaps.map(_.sequenceNumber).max,
      lastUpdatedMs = 0L, lastColumnId = 1, currentSchemaId = 0,
      schemas = List(SchemaDef(0, List(FieldDef(1, "id", "\"long\"", required = false)))),
      defaultSpecId = 0, partitionSpecs = List(PartSpec(0, Nil)),
      lastPartitionId = 999, defaultSortOrderId = 0, sortOrders = Nil,
      properties = Map.empty, currentSnapshotId = Some(snaps.last.snapshotId),
      snapshots = snaps, snapshotLog = Nil, metadataLog = Nil, refs = Map.empty)

    // complete chain 1->2->3: window (1, 3] is [2, 3] oldest-first,
    // base = snapshot 1, no truncation
    val m = meta(List(snap(11, None, 1), snap(12, Some(11), 2), snap(13, Some(12), 3)))
    val w = m.lineageWindowFrom(m.snapshot(13).get, 1)
    assert(w.chain.map(_.snapshotId) == List(12, 13))
    assert(w.base.map(_.snapshotId).contains(11) && w.truncatedParent.isEmpty)

    // full walk to genesis: base and truncatedParent both empty
    val w0 = m.lineageWindowFrom(m.snapshot(13).get, 0)
    assert(w0.chain.size == 3 && w0.base.isEmpty && w0.truncatedParent.isEmpty)

    // truncated: snapshot 12's parent expired
    val mt = meta(List(snap(12, Some(11), 2), snap(13, Some(12), 3)))
    val wt = mt.lineageWindowFrom(mt.snapshot(13).get, 0)
    assert(wt.chain.map(_.snapshotId) == List(12, 13))
    assert(wt.base.isEmpty && wt.truncatedParent.contains(11L))

    // parentId CYCLE (corrupt metadata) must fail loudly, never hand
    // back an in-cycle snapshot as the diff base (a silently wrong
    // changelog) — ungated seq window still above `above`
    val mc = meta(List(snap(21, Some(22), 4), snap(22, Some(21), 5)))
    val e = intercept[IllegalStateException] {
      mc.lineageWindowFrom(mc.snapshot(22).get, 2)
    }
    assert(e.getMessage.contains("CYCLE"), e.getMessage)
    // the unbounded sibling walk fails the same way — a silent
    // in-cycle prefix could let expiry misclassify live snapshots
    val e2 = intercept[IllegalStateException] { mc.lineageFrom(Some(22L)) }
    assert(e2.getMessage.contains("CYCLE"), e2.getMessage)
    // intact metadata is unaffected
    assert(m.lineageFrom(Some(13L)).map(_.snapshotId) == List(13, 12, 11))
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
