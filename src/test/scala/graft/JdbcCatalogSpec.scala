package graft

import graft.catalog.CommitFailedException
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

/** JDBC-backed catalog (C18 + the JDBC-side C1–C9): bootstrap,
  * pointer-CAS commits, persisted namespace properties, guarded
  * rename, and relocation of the file side.
  */
class JdbcCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(tag: String): String = {
    val wh = s"/tmp/graft_test_jdbc_$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set(s"spark.sql.catalog.j$tag", "graft.catalog.JdbcRelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.j$tag.warehouse", wh)
    s"j$tag"
  }

  test("DDL + DML round-trip with pointer rows as source of truth") {
    val c = fresh("rt")
    spark.sql(s"CREATE NAMESPACE $c.ns")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, data STRING)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 'Pizza'), (2, 'Pasta')")
    assert(spark.sql(s"SELECT COUNT(*) FROM $c.ns.t").collect()(0).getLong(0) == 2)
    assert(spark.sql(s"SHOW TABLES IN $c.ns").collect().map(_.getString(1)).contains("t"))
    spark.sql(s"INSERT INTO $c.ns.t VALUES (3, 'Sushi')")
    assert(spark.sql(s"SELECT COUNT(*) FROM $c.ns.t VERSION AS OF 1").collect()(0).getLong(0) == 2)
    assert(spark.sql(s"SELECT COUNT(*) FROM $c.ns.t").collect()(0).getLong(0) == 3)
  }

  test("namespace properties persist (the JDBC-only C5 capability)") {
    val c = fresh("props")
    spark.sql(s"CREATE NAMESPACE $c.p")
    spark.sql(s"ALTER NAMESPACE $c.p SET PROPERTIES ('team'='alice', 'tier'='gold')")
    val meta = spark.sql(s"DESCRIBE NAMESPACE EXTENDED $c.p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta.nonEmpty)
    val cata = spark.sessionState.catalogManager.catalog(c)
      .asInstanceOf[graft.catalog.JdbcRelativeCatalog]
    assert(cata.loadNamespaceMetadata(Array("p")).get("team") == "alice")
    spark.sql(s"ALTER NAMESPACE $c.p UNSET PROPERTIES ('tier')")
    assert(!cata.loadNamespaceMetadata(Array("p")).containsKey("tier"))
  }

  test("concurrent commit: pointer CAS lets exactly one writer win") {
    val c = fresh("cas")
    spark.sql(s"CREATE NAMESPACE $c.c")
    spark.sql(s"CREATE TABLE $c.c.t (id BIGINT)")
    val cat = spark.sessionState.catalogManager.catalog(c)
      .asInstanceOf[graft.catalog.JdbcRelativeCatalog]
    val t = cat.loadTable(Identifier.of(Array("c"), "t"))
      .asInstanceOf[graft.catalog.GraftTable]
    val (v, m) = t.ops.refresh().get
    t.ops.commit(v, m.copy(lastUpdatedMs = 1L))
    intercept[CommitFailedException] {
      t.ops.commit(v, m.copy(lastUpdatedMs = 2L))
    }
    assert(t.ops.refresh().get._1 == v + 1)
  }

  test("guarded rename; duplicate target rejected") {
    val c = fresh("ren")
    spark.sql(s"CREATE NAMESPACE $c.r")
    spark.sql(s"CREATE TABLE $c.r.a (id BIGINT)")
    spark.sql(s"INSERT INTO $c.r.a VALUES (9)")
    spark.sql(s"CREATE TABLE $c.r.b (id BIGINT)")
    intercept[Exception] { spark.sql(s"ALTER TABLE $c.r.a RENAME TO $c.r.b") }
    spark.sql(s"ALTER TABLE $c.r.a RENAME TO $c.r.a2")
    assert(spark.sql(s"SELECT id FROM $c.r.a2").collect()(0).getLong(0) == 9)
    assert(!spark.sql(s"SHOW TABLES IN $c.r").collect().map(_.getString(1)).contains("a"))
  }
}
