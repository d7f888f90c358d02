package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics the q_cat_ivm oracle can't reach with the stock fixtures:
  * a group whose rows are ALL deleted must vanish from the maintained
  * aggregate (count reaches zero → the ⊕ filter drops it), and a group
  * born after the base snapshot must appear — planted data drives both
  * edges through the same base-snapshot ⊕ signed-changelog combine the
  * declared query uses.
  */
class IvmSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("changelog-maintained aggregate: dead groups vanish, new groups appear, survivors exact") {
    val wh = s"/tmp/graft_test_ivm"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set("spark.sql.catalog.tivm", "graft.catalog.RelativeCatalog")
    spark.conf.set("spark.sql.catalog.tivm.warehouse", wh)
    spark.sql("CREATE NAMESPACE tivm.ns")
    spark.sql("CREATE TABLE tivm.ns.t (g STRING, v BIGINT)")
    spark.sql("INSERT INTO tivm.ns.t VALUES ('a', 1), ('a', 2), ('b', 10), ('b', 20)") // v1
    spark.sql("DELETE FROM tivm.ns.t WHERE g = 'b'")                                   // v2: kills b
    spark.sql("INSERT INTO tivm.ns.t VALUES ('c', 100), ('a', 3)")                     // v3: births c

    val base = spark.sql("SELECT * FROM tivm.ns.t VERSION AS OF 1")
      .groupBy(col("g")).agg(count(lit(1)).as("n0"), sum(col("v")).as("s0"))
    val delta = spark.read.option("start-snapshot-id", "1")
      .table("tivm.ns.`t$changes`")
      .withColumn("sgn", when(col("_change_type") === "insert", 1L).otherwise(-1L))
      .groupBy(col("g"))
      .agg(sum(col("sgn")).as("nd"), sum(col("sgn") * col("v")).as("sd"))
    val maintained = base.join(delta, Seq("g"), "full_outer")
      .select(col("g"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("nd"), lit(0L))).as("n"),
        (coalesce(col("s0"), lit(0L)) + coalesce(col("sd"), lit(0L))).as("s"))
      .filter(col("n") > 0)
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val recomputed = spark.sql("SELECT * FROM tivm.ns.t")
      .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(maintained.toSeq == Seq(("a", 3L, 6L), ("c", 1L, 100L)))
    assert(maintained.toSeq == recomputed.toSeq,
      "incremental maintenance diverged from full recompute")
    assert(!maintained.exists(_._1 == "b"), "fully-deleted group must vanish")
  }
}
