package graft

import org.scalatest.funsuite.AnyFunSuite

/** Merge-schema ingest (Iceberg's accept-any-schema + merge-schema
  * write option): evolving pipelines append frames with new or widened
  * columns and the table follows, metadata-only — while every
  * unrequested mismatch stays a loud error, never a silently dropped
  * column.
  */
class MergeSchemaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshWh(name: String): String = {
    val wh = s"/tmp/graft_test_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.RelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("merge-schema append: adds columns, widens types, null-fills gaps; all metadata-only") {
    freshWh("tcMs")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE tcMs.m")
    spark.sql("CREATE TABLE tcMs.m.t (id BIGINT, v INT) " +
      "TBLPROPERTIES ('write.merge-schema'='true')")
    spark.sql("INSERT INTO tcMs.m.t VALUES (1, 10), (2, 20)")

    // new column `note`, `v` arrives as LONG (widens INT)
    Seq((3L, 30L, "hello"), (4L, 40L, "world"))
      .toDF("id", "v", "note")
      .writeTo("tcMs.m.t").option("merge-schema", "true").append()
    assert(spark.table("tcMs.m.t").schema.map(f => f.name -> f.dataType.simpleString) ==
      Seq("id" -> "bigint", "v" -> "bigint", "note" -> "string"))
    // old rows read NULL for the added column; old INT files up-cast
    assert(spark.sql("SELECT COUNT(*), SUM(v), COUNT(note) FROM tcMs.m.t")
      .collect()(0).toSeq == Seq(4L, 100L, 2L))

    // a later frame that OMITS nullable columns is null-filled
    Seq((5L)).toDF("id").writeTo("tcMs.m.t").option("merge-schema", "true").append()
    assert(spark.sql("SELECT v, note FROM tcMs.m.t WHERE id = 5").collect()(0)
      .toSeq == Seq(null, null))

    // evolution was by field id: rename keeps both populations readable
    spark.sql("ALTER TABLE tcMs.m.t RENAME COLUMN note TO remark")
    assert(spark.sql("SELECT COUNT(remark) FROM tcMs.m.t").collect()(0).getLong(0) == 2)

    // data files were never rewritten (metadata-only evolution):
    // 3 write commits -> 3 data-file generations, all still referenced
    val cat = spark.sessionState.catalogManager.catalog("tcMs")
      .asInstanceOf[graft.catalog.RelativeCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("m"), "t"))
      .asInstanceOf[graft.catalog.GraftTable]
    assert(t.meta.schemas.size >= 3, "each merge should append a schema generation")
  }

  test("explicit merge is by-name (all-renamed frame evolves); option-less SQL stays positional") {
    freshWh("tcMs3")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE tcMs3.m")
    spark.sql("CREATE TABLE tcMs3.m.t (id BIGINT) " +
      "TBLPROPERTIES ('write.merge-schema'='true')")
    spark.sql("INSERT INTO tcMs3.m.t VALUES (1)")
    // same arity + zero name overlap, WITH the merge option: explicit
    // DataFrame merge = by-name intent — must evolve the schema, not
    // silently write user_id values into `id` (the mis-bind the old
    // positional heuristic allowed)
    Seq(Tuple1(7L)).toDF("user_id")
      .writeTo("tcMs3.m.t").option("merge-schema", "true").append()
    assert(spark.table("tcMs3.m.t").schema.fieldNames.toSeq == Seq("id", "user_id"))
    assert(spark.sql("SELECT id, user_id FROM tcMs3.m.t ORDER BY id NULLS LAST")
      .collect().map(_.toSeq).toSeq == Seq(Seq(1L, null), Seq(null, 7L)))
    // WITHOUT the option, SQL insert semantics are positional — and SQL
    // cannot pass writer options, so expression-named INSERT ... SELECT
    // (names like "(51 + 0)") must keep Spark's by-position behavior
    spark.sql("INSERT INTO tcMs3.m.t SELECT 51 + 0, 90 + 9")
    assert(spark.sql("SELECT user_id FROM tcMs3.m.t WHERE id = 51")
      .collect()(0).getLong(0) == 99L)
    // synthetic positional VALUES (col1, col2, …) too
    spark.sql("INSERT INTO tcMs3.m.t VALUES (2, 9)")
    assert(spark.sql("SELECT user_id FROM tcMs3.m.t WHERE id = 2")
      .collect()(0).getLong(0) == 9L)
    // an ARITY-mismatched option-less frame is still refused loudly,
    // never silently dropped
    val e = intercept[Exception] {
      Seq((3L, 4L, 5L)).toDF("x", "y", "z").writeTo("tcMs3.m.t").append()
    }
    assert(e.getMessage.contains("merge-schema"), e.getMessage)
  }

  test("mismatches stay loud: no silent drops, no narrowing, no dynamic/streaming merges") {
    freshWh("tcMs2")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE tcMs2.m")
    spark.sql("CREATE TABLE tcMs2.m.t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.merge-schema'='true')")
    spark.sql("INSERT INTO tcMs2.m.t VALUES (1, 1)")

    // extra column WITHOUT the writer option: refused, never dropped
    val e1 = intercept[Exception] {
      Seq((2L, 2L, "x")).toDF("id", "v", "extra").writeTo("tcMs2.m.t").append()
    }
    assert(e1.getMessage.contains("merge-schema"), e1.getMessage)
    assert(spark.sql("SELECT COUNT(*) FROM tcMs2.m.t").collect()(0).getLong(0) == 1)

    // narrowing is never a merge: v is BIGINT, an INT frame is fine to
    // WRITE (upcast) but must not narrow the table
    Seq((3L, 3)).toDF("id", "v").writeTo("tcMs2.m.t")
      .option("merge-schema", "true").append()
    assert(spark.table("tcMs2.m.t").schema("v").dataType.simpleString == "bigint")
    assert(spark.sql("SELECT SUM(v) FROM tcMs2.m.t").collect()(0).getLong(0) == 4)

    // incompatible type: loud
    val e2 = intercept[Exception] {
      Seq((4L, "oops")).toDF("id", "v").writeTo("tcMs2.m.t")
        .option("merge-schema", "true").append()
    }
    assert(e2.getMessage.contains("neither side widens"), e2.getMessage)

    // a table WITHOUT the property keeps Spark's own validation
    spark.sql("CREATE TABLE tcMs2.m.plain (id BIGINT)")
    intercept[Exception] {
      Seq((1L, "x")).toDF("id", "extra").writeTo("tcMs2.m.plain").append()
    }

    // dynamic overwrite with an unknown column: loud
    spark.sql("CREATE TABLE tcMs2.m.pt (id BIGINT, k INT) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.merge-schema'='true')")
    val e3 = intercept[Exception] {
      Seq((1L, 1, "x")).toDF("id", "k", "extra").writeTo("tcMs2.m.pt")
        .overwritePartitions()
    }
    assert(e3.getMessage.contains("dynamic partition overwrite"), e3.getMessage)
  }
}
