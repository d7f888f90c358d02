package graft

import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** CDC incremental-tail admission: a single APPEND commit whose added
  * rows alone exceed `max-rows-per-trigger` — the "someone lands a
  * 10 TB backfill as one commit" path — must drain as file-granular
  * slices via `{"seq":N,"idx":K,"unit":"added"}` offsets, exactly like
  * the table-tail source splits the same unit. Appends carry no delete
  * files, so each slice is an exact insert-tagged subset of the
  * commit's rows: bounded, disjoint, checkpoint-resumable. The genesis
  * twin is CdcGenesisSplitSpec. */
class CdcTailSplitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshWh(name: String): String = {
    val wh = s"/tmp/graft_test_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.RelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  private def gt(cat: String): graft.catalog.GraftTable =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.catalog.RelativeCatalog]
      .loadTable(Identifier.of(Array("st"), "t"))
      .asInstanceOf[graft.catalog.GraftTable]

  /** Seed commit (seq 1, ids 1000..1004) then ONE 8-file append
    * (seq 2, ids 0..79, 10 rows per file). */
  private def seedPlusBackfill(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.st")
    spark.sql(s"CREATE TABLE $cat.st.t (id BIGINT)")
    spark.range(1000, 1005).coalesce(1).writeTo(s"$cat.st.t").append()
    // 8 input partitions of exactly 10 consecutive ids each → the one
    // commit lands as 8 ten-row files (deterministic slice arithmetic)
    spark.range(0, 80, 1, 8).writeTo(s"$cat.st.t").append()
    val t = gt(cat)
    assert(t.meta.snapshots.size == 2, "setup: the backfill must be ONE commit")
    assert(t.ops.addedFiles(t.meta.currentSnapshot.get).size == 8,
      "setup: the backfill commit must carry 8 files")
  }

  private def collector(seen: java.util.Queue[(Long, String, Int, Long)]) =
    (df: org.apache.spark.sql.DataFrame, batchId: Long) => {
      df.collect().foreach(r => seen.add((r.getAs[Long]("id"),
        r.getAs[String]("_change_type"), r.getAs[Int]("_change_ordinal"), batchId)))
      (): Unit
    }

  test("an oversized append in the CDC tail drains as bounded insert slices") {
    freshWh("tcCdcTsp")
    seedPlusBackfill("tcCdcTsp")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Long)]()
    // start-seq=1: the stream is a pure TAIL past the seed commit, so
    // the split under test is the tail's, not the genesis unit's
    val q = spark.readStream.format("graft-cdc")
      .option("table", "tcCdcTsp.st.t")
      .option("start-seq", "1")
      .option("max-rows-per-trigger", "20")
      .load()
      .writeStream.foreachBatch(collector(seen))
      .outputMode("append").start()
    try q.processAllAvailable()
    finally { q.stop(); graft.streaming.Hygiene.unload(q.runId) }
    import scala.jdk.CollectionConverters._
    val byBatch = seen.asScala.toSeq.groupBy(_._4).toSeq.sortBy(_._1).map(_._2)
    assert(byBatch.size == 4,
      s"expected 4 slices (8 files / 2 per 20-row budget): ${byBatch.map(_.size)}")
    assert(byBatch.forall(_.size <= 20),
      s"a batch exceeded the rows cap: ${byBatch.map(_.size)}")
    assert(seen.asScala.forall(r => r._2 == "insert" && r._3 == 1),
      "slices of one append are ordinal-1 inserts")
    assert(byBatch.flatten.map(_._1).toSet == (0L until 80L).toSet,
      "slices must union to exactly the commit's rows")
    assert(byBatch.map(_.size).sum == 80, "overlapping slices")
  }

  test("a final added slice shares its trigger with tail commits the budget still admits (ordinals shift)") {
    freshWh("tcCdcTspM")
    seedPlusBackfill("tcCdcTspM")
    // a 10-row append AFTER the backfill: the final slice (20 rows of
    // a 30-row budget) leaves room and must admit it, ordinal-shifted
    spark.range(2000, 2010).coalesce(1).writeTo("tcCdcTspM.st.t").append()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Long)]()
    val q = spark.readStream.format("graft-cdc")
      .option("table", "tcCdcTspM.st.t")
      .option("start-seq", "1")
      .option("max-rows-per-trigger", "30")
      .load()
      .writeStream.foreachBatch(collector(seen))
      .outputMode("append").start()
    try q.processAllAvailable()
    finally { q.stop(); graft.streaming.Hygiene.unload(q.runId) }
    import scala.jdk.CollectionConverters._
    val byBatch = seen.asScala.toSeq.groupBy(_._4).toSeq.sortBy(_._1).map(_._2)
    // [0,3) = 30, [3,6) = 30, then [6,8) = 20 + the 10-row tail append
    assert(byBatch.size == 3 && byBatch.forall(_.size == 30),
      s"expected three 30-row batches: ${byBatch.map(_.size)}")
    val mixed = byBatch.last
    val (slicePart, tailPart) = mixed.partition(_._1 < 1000)
    assert(slicePart.size == 20 && tailPart.size == 10, s"mixed batch wrong: $mixed")
    assert(slicePart.forall(_._3 == 1) && tailPart.forall(_._3 == 2),
      "tail ordinals must shift past the slice's ordinal 1")
    assert(seen.asScala.map(_._1).toSeq.sorted ==
      ((0L until 80L) ++ (2000L until 2010L)), "rows lost or duplicated")
  }

  test("mid-added-drain checkpoint resume: committed slices never replay, remainder arrives exactly") {
    freshWh("tcCdcTspR")
    seedPlusBackfill("tcCdcTspR")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcts_ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Long)]()
    def start(trigger: Option[Trigger]) = {
      val w = spark.readStream.format("graft-cdc")
        .option("table", "tcCdcTspR.st.t")
        .option("start-seq", "1")
        .option("max-rows-per-trigger", "20")
        .load()
        .writeStream.foreachBatch(collector(seen))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
      trigger.fold(w)(w.trigger).start()
    }
    // a long trigger interval isolates exactly ONE micro-batch
    val q1 = start(Some(Trigger.ProcessingTime("5 minutes")))
    try {
      val commit0 = new java.io.File(s"$ckpt/commits/0")
      val deadline = System.currentTimeMillis() + 120000
      while (!commit0.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(commit0.exists(), "batch 0 never committed")
    } finally { q1.stop(); graft.streaming.Hygiene.unload(q1.runId) }
    import scala.jdk.CollectionConverters._
    val run1 = seen.asScala.toSeq.map(_._1).toSet
    assert(run1.size == 20, s"run 1 delivered ${run1.size} rows")
    // the checkpointed offset IS mid-unit and names the unit KIND
    val off0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$ckpt/offsets/0")), "UTF-8")
    assert(off0.contains("\"idx\":2") && off0.contains("\"unit\":\"added\""),
      s"offset 0 not an added-unit slice: $off0")

    seen.clear()
    val q2 = start(None)
    try q2.processAllAvailable()
    finally { q2.stop(); graft.streaming.Hygiene.unload(q2.runId) }
    val run2 = seen.asScala.toSeq.map(_._1).toSet
    assert(run2.intersect(run1).isEmpty, "committed added slice replayed after resume")
    assert(run1 ++ run2 == (0L until 80L).toSet,
      s"rows lost across the restart: ${(run1 ++ run2).size}")
  }

  test("a split never skips expired history: restart at an expired seq fails loudly even when the next retained commit is an over-cap append") {
    // The slice batch is served by addedSlice, BYPASSING
    // Changes.between — whose expired-base check is the unsplit
    // path's truncation guard. Without the split-time re-assert, this
    // restart would advance the offset log straight past the expired
    // commits' change rows: silent data loss exactly where the
    // unsplit path throws.
    freshWh("tcCdcTspX")
    spark.sql("CREATE NAMESPACE tcCdcTspX.st")
    spark.sql("CREATE TABLE tcCdcTspX.st.t (id BIGINT)")
    (0 until 3).foreach(i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1).writeTo("tcCdcTspX.st.t").append())
    spark.range(100, 180, 1, 8).writeTo("tcCdcTspX.st.t").append() // seq 4, over-cap
    graft.catalog.Maintenance.expireSnapshots(gt("tcCdcTspX").ops, keepLast = 1): Unit
    val ops = gt("tcCdcTspX").ops
    val meta = ops.refresh().get._2
    assert(meta.snapshots.map(_.sequenceNumber) == List(4L), "setup: only seq 4 retained")
    val src = new graft.streaming.GraftCdcSource(spark, ops, meta, 0L,
      maxRowsPerTrigger = Some(20L))
    // checkpointed offset seq 1 — its snapshot (and 2, 3) expired
    val e = intercept[IllegalStateException] {
      src.latestOffset(graft.streaming.CdcOffset(1), src.getDefaultReadLimit)
    }
    assert(e.getMessage.contains("expired"), e.getMessage)
    // the same restart where the next commit FITS the cap fails the
    // same way through Changes.between (the unsplit path's own guard)
    // — the split must not be the one lenient path
  }

  test("added-unit offsets round-trip; genesis and legacy forms keep parsing") {
    freshWh("tcCdcTspO")
    spark.sql("CREATE NAMESPACE tcCdcTspO.st")
    spark.sql("CREATE TABLE tcCdcTspO.st.t (id BIGINT)")
    spark.sql("INSERT INTO tcCdcTspO.st.t VALUES (1)")
    val ops = new graft.catalog.TableOps("/tmp/graft_test_tcCdcTspO", "st/t")
    val src = new graft.streaming.GraftCdcSource(spark, ops, ops.refresh().get._2, 0L)
    import graft.streaming.CdcOffset
    assert(CdcOffset(7, 3, "added").json == """{"seq":7,"idx":3,"unit":"added"}""")
    assert(src.deserializeOffset("""{"seq":7,"idx":3,"unit":"added"}""") ==
      CdcOffset(7, 3, "added"))
    assert(CdcOffset(7, 3, "rows").json == """{"seq":7,"idx":3,"unit":"rows"}""")
    assert(src.deserializeOffset("""{"seq":7,"idx":3,"unit":"rows"}""") ==
      CdcOffset(7, 3, "rows"))
    assert(src.deserializeOffset("""{"seq":7,"idx":3}""") == CdcOffset(7, 3))
    assert(src.deserializeOffset("""{"seq":7}""") == CdcOffset(7))
    assert(src.deserializeOffset("5") == CdcOffset(5))
  }
}
