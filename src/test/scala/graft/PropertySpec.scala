package graft

import graft.catalog.TableOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Remaining SURVEY §5.3/§5.4 properties: commit version monotonicity,
  * dedup idempotence, top-k ⊆ sorted prefix, and a
  * flatMapGroupsWithState stream-vs-batch equivalence.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("commit versions are strictly monotonic across writers") {
    val wh = "/tmp/graft_test_mono"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set("spark.sql.catalog.tcMono", "graft.catalog.RelativeCatalog")
    spark.conf.set("spark.sql.catalog.tcMono.warehouse", wh)
    spark.sql("CREATE NAMESPACE tcMono.p")
    spark.sql("CREATE TABLE tcMono.p.t (id BIGINT)")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    (1 to 8).foreach { i =>
      spark.sql(s"INSERT INTO tcMono.p.t VALUES ($i)")
      seen += new TableOps(wh, "p/t").refresh().get._1
    }
    assert(seen.toSeq == seen.toSeq.sorted && seen.distinct.size == seen.size)
    val meta = new TableOps(wh, "p/t").refresh().get._2
    assert(meta.snapshots.map(_.sequenceNumber) == (1L to 8L).toList)
  }

  test("relevantDeletes soundness: every delete referencing a scanned file is kept") {
    import graft.meta.DataFile
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val dataPaths = (0 until 1 + rnd.nextInt(20)).map(i =>
        s"ns/t/data/${java.util.UUID.nameUUIDFromBytes(Array(i.toByte, rnd.nextInt(4).toByte))}/part-$i.parquet")
      val dataFiles = dataPaths.map(p => DataFile(p, 10, 100))
      val deletes = (0 until rnd.nextInt(6)).map { _ =>
        val referenced = rnd.shuffle(dataPaths).take(1 + rnd.nextInt(3))
        // exact bounds, as the position-delete writer stamps them
        DataFile(s"ns/t/deletes/${rnd.nextInt(1000)}.parquet", referenced.size.toLong, 50,
          minBound = Map("file_path" -> referenced.min),
          maxBound = Map("file_path" -> referenced.max)) -> referenced.toSet
      }
      val scanned = rnd.shuffle(dataFiles).take(rnd.nextInt(dataFiles.size + 1))
      val kept = graft.catalog.Mor.relevantDeletes(deletes.map(_._1), scanned).toSet
      val scannedPaths = scanned.map(_.path).toSet
      deletes.foreach { case (d, refs) =>
        if (refs.intersect(scannedPaths).nonEmpty)
          assert(kept(d),
            s"unsound: delete $d referencing ${refs.intersect(scannedPaths)} was pruned")
      }
    }
  }

  test("equality-delete bounds pruning soundness vs brute-force row matching") {
    import graft.meta.DataFile
    val rnd = new scala.util.Random(7)
    // values a key column might hold: ints, digit-strings (the
    // lex-vs-numeric trap), words, and nulls
    def randValue(): Option[String] = rnd.nextInt(10) match {
      case 0 => None // null key
      case 1 | 2 | 3 => Some(rnd.nextInt(40).toString) // digit-string / int
      case _ => Some(Seq("apple", "pear", "zebra", "kiwi", "fig")(rnd.nextInt(5)))
    }
    (1 to 500).foreach { _ =>
      val delRows = Seq.fill(1 + rnd.nextInt(4))(randValue())
      val fileRows = Seq.fill(1 + rnd.nextInt(6))(randValue())
      val dSeq = 1L + rnd.nextInt(5)
      val fSeq = 1L + rnd.nextInt(5)
      def stats(rows: Seq[Option[String]]) = {
        val nonNull = rows.flatten
        // ground truth ordering is LEXICOGRAPHIC here (string column of
        // mixed digit-strings and words) — exactly the ambiguous case
        (if (nonNull.isEmpty) Map.empty[String, String] else Map("k" -> nonNull.min),
          if (nonNull.isEmpty) Map.empty[String, String] else Map("k" -> nonNull.max),
          Map("k" -> rows.count(_.isEmpty).toLong))
      }
      val (dmin, dmax, dnull) = stats(delRows)
      val (fmin, fmax, fnull) = stats(fileRows)
      val d = DataFile("deletes/d.parquet", delRows.size.toLong, 1, seq = Some(dSeq),
        content = Some("equality"), minBound = dmin, maxBound = dmax, nullCount = dnull)
      val f = DataFile("data/f.parquet", fileRows.size.toLong, 1, seq = Some(fSeq),
        minBound = fmin, maxBound = fmax, nullCount = fnull)
      // brute force: some row of f is null-safe-equal to some delete row
      // and the delete's commit is strictly newer
      val kills = dSeq > fSeq && delRows.exists(dv => fileRows.exists(_ == dv))
      if (kills)
        assert(graft.catalog.Mor.equalityDeleteMayApply(d, f),
          s"unsound prune: delRows=$delRows fileRows=$fileRows dSeq=$dSeq fSeq=$fSeq")
    }
  }

  test("exact dedup is idempotent") {
    val once = SparkEntry.queries("q_llm_exactdedup")(spark, TestSpark.sf)
    // dedup of already-deduped keepers finds nothing further
    val keepers = Tables(spark, TestSpark.sf, "documents")
      .withColumn("h", sha2(lower(trim(col("text"))).cast("binary"), 256))
      .groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    val again = keepers.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(again.count() == 0)
    assert(once.count() >= 0) // query itself evaluates
  }

  test("top-k is a prefix of the global sort") {
    val topk = SparkEntry.queries("q_topk")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sorted = Tables(spark, TestSpark.sf, "orders")
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(topk.size).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(topk == sorted)
  }

  test("flatMapGroupsWithState stream equals batch aggregation") {
    import spark.implicits._
    case class E(user_id: Long, value: Double)
    val evs = Tables(spark, TestSpark.sf, "events")
      .select(col("user_id"), col("value")).as[(Long, Double)].collect().toSeq
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val ms = MemoryStream[(Long, Double)]
    val q = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Double)],
         st: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = st.getOption.getOrElse(0L) + it.size
          st.update(n)
          Iterator.single((uid, n))
      }
      .toDF("user_id", "n")
      .writeStream.format("memory").queryName("fmgws").outputMode("append").start()
    try { ms.addData(evs); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("fmgws").groupBy(col("user_id"))
      .agg(max(col("n")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables(spark, TestSpark.sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
