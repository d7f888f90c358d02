package graft

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

/** `write.parquet.bloom-filter-columns`: listed columns get a parquet
  * bloom filter per row group on BOTH write paths (DataFrameWriter
  * staging and the partitioned fanout writer), unlisted columns don't,
  * and an equality lookup on the bloomed column still returns exact
  * rows. At 100 TB this is the row-group-skipping path for point
  * lookups on high-cardinality non-sort columns whose min/max bounds
  * can't prune anything.
  */
class BloomFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def bloomOffsets(wh: String): Map[String, Long] = {
    val files = Io.walk(wh).filter(p => p.endsWith(".parquet") && p.contains("/data/"))
    assert(files.nonEmpty, s"no data files under $wh")
    val conf = new org.apache.hadoop.conf.Configuration()
    files.flatMap { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
      try {
        val cols = r.getFooter.getBlocks.get(0).getColumns
        (0 until cols.size).map { i =>
          val c = cols.get(i)
          c.getPath.toDotString -> c.getBloomFilterOffset
        }
      } finally r.close()
    }.toMap
  }

  private object Io {
    def walk(root: String): Seq[String] = {
      val p = java.nio.file.Paths.get(root)
      if (!java.nio.file.Files.exists(p)) Nil
      else {
        val s = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
            .map(_.toString).toList
        } finally s.close()
      }
    }
  }

  test("bloom filters stamp on listed columns only, both write paths; lookups stay exact") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bloom_wh").toString
    val c = "graftbloomcat"
    spark.conf.set(s"spark.sql.catalog.$c", "graft.catalog.RelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $c.b")

    // unpartitioned → V2 write path
    spark.sql(s"CREATE TABLE $c.b.flat (id BIGINT, data STRING) " +
      "TBLPROPERTIES ('write.parquet.bloom-filter-columns'='id')")
    spark.sql(s"INSERT INTO $c.b.flat SELECT id, CAST(id AS STRING) " +
      "FROM range(0, 1000)")
    val flat = bloomOffsets(s"$wh/b/flat")
    assert(flat("id") >= 0, s"id must carry a bloom filter: $flat")
    assert(flat("data") < 0, s"unlisted column must not: $flat")

    // partitioned → fanout write path
    spark.sql(s"CREATE TABLE $c.b.part (id BIGINT, cat STRING) " +
      s"PARTITIONED BY (cat) " +
      "TBLPROPERTIES ('write.parquet.bloom-filter-columns'='id')")
    spark.sql(s"INSERT INTO $c.b.part SELECT id, " +
      s"CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END FROM range(0, 1000)")
    val part = bloomOffsets(s"$wh/b/part")
    assert(part("id") >= 0, s"fanout path must stamp blooms too: $part")

    // exactness: the pushed equality predicate returns exactly one row
    val hit = spark.sql(s"SELECT data FROM $c.b.flat WHERE id = 421").collect()
    assert(hit.map(_.getString(0)).toSeq == Seq("421"))
    assert(spark.sql(s"SELECT * FROM $c.b.part WHERE id = 2000").count() == 0)

    spark.sql(s"DROP NAMESPACE $c.b CASCADE")
  }
}
