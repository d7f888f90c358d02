package graft

import graft.streaming.CdcOffset
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The LAST unbounded CDC unit, closed opt-in: a row-level (COW)
  * commit's change rows are a Catalyst plan — no file list to slice —
  * so under `split-row-level=true` the source MATERIALIZES the diff
  * once (files capped at `maxRecordsPerFile = max-rows-per-trigger`,
  * written atomically under the stream's own checkpoint source dir)
  * and drains it as `{"seq":N,"idx":K,"unit":"rows"}` slices: a
  * table-wide COW MERGE arrives as bounded batches instead of one
  * micro-batch the size of the commit. Replay safety comes from the
  * PERSISTED files (never recomputed mid-drain — the diff's
  * row-to-file assignment is not deterministic across recomputations;
  * a lost dir fails loudly), and cleanup is replay-safe: a unit is
  * deleted only once neither offset of the last COMMITTED batch
  * references it (Spark re-runs that batch's getBatch at every
  * restart). Default behavior (no option) stays admit-and-close. */
class CdcRowLevelSplitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshWh(name: String): String = {
    val wh = s"/tmp/graft_test_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.RelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  /** seq 1: ids 0..59 (one file); seq 2: COW DELETE of ids < 30 —
    * a row-level commit whose change rows are 30 deletes. */
  private def cowTable(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.st")
    spark.sql(s"CREATE TABLE $cat.st.t (id BIGINT)")
    spark.range(0, 60).coalesce(1).writeTo(s"$cat.st.t").append()
    spark.sql(s"DELETE FROM $cat.st.t WHERE id < 30")
  }

  private def collector(seen: java.util.Queue[(Long, String, Int, Long)]) =
    (df: org.apache.spark.sql.DataFrame, batchId: Long) => {
      df.collect().foreach(r => seen.add((r.getAs[Long]("id"),
        r.getAs[String]("_change_type"), r.getAs[Int]("_change_ordinal"), batchId)))
      (): Unit
    }

  test("a COW delete drains as bounded delete slices under split-row-level") {
    freshWh("tcCdcRls")
    cowTable("tcCdcRls")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Long)]()
    val q = spark.readStream.format("graft-cdc")
      .option("table", "tcCdcRls.st.t")
      .option("start-seq", "1")
      .option("max-rows-per-trigger", "10")
      .option("split-row-level", "true")
      .load()
      .writeStream.foreachBatch(collector(seen))
      .outputMode("append").start()
    try q.processAllAvailable()
    finally { q.stop(); graft.streaming.Hygiene.unload(q.runId) }
    import scala.jdk.CollectionConverters._
    val byBatch = seen.asScala.toSeq.groupBy(_._4).toSeq.sortBy(_._1).map(_._2)
    // ~3 slices of <= 10 rows; the diff's spill-file sizes depend on
    // its shuffle layout, so greedy whole-file packing can land 3-5
    assert(byBatch.size >= 3 && byBatch.size <= 5,
      s"expected ~3 bounded slices (30 delete rows, cap 10): ${byBatch.map(_.size)}")
    assert(byBatch.forall(_.size <= 10),
      s"a batch exceeded the rows cap: ${byBatch.map(_.size)}")
    assert(seen.asScala.forall(r => r._2 == "delete" && r._3 == 1),
      "a COW delete's change rows are ordinal-1 deletes")
    assert(byBatch.flatten.map(_._1).toSet == (0L until 30L).toSet,
      "slices must union to exactly the commit's change rows")
    assert(byBatch.map(_.size).sum == 30, "overlapping slices")
  }

  test("default (no opt-in) keeps admit-and-close: one batch the size of the commit") {
    freshWh("tcCdcRlsD")
    cowTable("tcCdcRlsD")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Long)]()
    val q = spark.readStream.format("graft-cdc")
      .option("table", "tcCdcRlsD.st.t")
      .option("start-seq", "1")
      .option("max-rows-per-trigger", "10")
      .load()
      .writeStream.foreachBatch(collector(seen))
      .outputMode("append").start()
    try q.processAllAvailable()
    finally { q.stop(); graft.streaming.Hygiene.unload(q.runId) }
    import scala.jdk.CollectionConverters._
    val byBatch = seen.asScala.toSeq.groupBy(_._4).map(_._2)
    assert(byBatch.size == 1 && byBatch.head.size == 30,
      s"admit-and-close must deliver the commit whole: ${byBatch.map(_.size)}")
  }

  test("mid-rows-drain checkpoint resume: committed slices never replay, remainder is read from the PERSISTED files") {
    freshWh("tcCdcRlsR")
    cowTable("tcCdcRlsR")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcrls_ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Long)]()
    def start(trigger: Option[Trigger]) = {
      val w = spark.readStream.format("graft-cdc")
        .option("table", "tcCdcRlsR.st.t")
        .option("start-seq", "1")
        .option("max-rows-per-trigger", "10")
        .option("split-row-level", "true")
        .load()
        .writeStream.foreachBatch(collector(seen))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
      trigger.fold(w)(w.trigger).start()
    }
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
    // greedy whole-file packing: the first slice is <= the cap (and
    // can undershoot it when spill-file sizes don't divide evenly)
    assert(run1.nonEmpty && run1.size <= 10, s"run 1 delivered ${run1.size} rows")
    val off0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$ckpt/offsets/0")), "UTF-8")
    assert(off0.contains("\"idx\":") && off0.contains("\"unit\":\"rows\""),
      s"offset 0 not a rows-unit slice: $off0")
    // the materialized unit sits under the stream's own source dir
    val spill = new java.io.File(s"$ckpt/sources/0/graft-rowlevel/seq-2")
    assert(spill.isDirectory, s"materialized unit missing at $spill")

    seen.clear()
    val q2 = start(None)
    try q2.processAllAvailable()
    finally { q2.stop(); graft.streaming.Hygiene.unload(q2.runId) }
    val run2 = seen.asScala.toSeq.map(_._1).toSet
    assert(run2.intersect(run1).isEmpty, "committed rows slice replayed after resume")
    assert(run1 ++ run2 == (0L until 30L).toSet,
      s"rows lost across the restart: ${(run1 ++ run2).size}")
  }

  test("restart after a COMPLETED rows drain keeps working: the committed final batch's replay still finds its unit") {
    // The scenario that would brick the checkpoint if commit() deleted
    // the spill dir eagerly: Spark's populateStartOffsets re-invokes
    // getBatch on the LAST COMMITTED batch at every restart, and after
    // a completed drain that batch's start offset names the rows unit.
    freshWh("tcCdcRlsRb")
    cowTable("tcCdcRlsRb")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcrlsrb_ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Long)]()
    def start() = spark.readStream.format("graft-cdc")
      .option("table", "tcCdcRlsRb.st.t")
      .option("start-seq", "1")
      .option("max-rows-per-trigger", "10")
      .option("split-row-level", "true")
      .load()
      .writeStream.foreachBatch(collector(seen))
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable()
    finally { q1.stop(); graft.streaming.Hygiene.unload(q1.runId) }
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.map(_._1).toSet == (0L until 30L).toSet, "drain incomplete")

    // new traffic lands while the stream is down; the restart must
    // replay the committed final batch (needs the unit dir), then
    // deliver exactly the new commit
    spark.sql("INSERT INTO tcCdcRlsRb.st.t VALUES (777)")
    seen.clear()
    val q2 = start()
    try q2.processAllAvailable()
    finally { q2.stop(); graft.streaming.Hygiene.unload(q2.runId) }
    assert(seen.asScala.toSet.map((r: (Long, String, Int, Long)) => (r._1, r._2)) ==
      Set((777L, "insert")),
      s"resume after a completed drain must deliver exactly the new commit: " +
        s"${seen.asScala.toList}")
  }

  test("back-to-back row-level commits each split as their OWN unit — one never piggybacks another's trigger") {
    // the unbounded-batch regression guard: a row-level commit's
    // change-row count is unbudgeted, so admitting one into a trigger
    // that already spent budget (e.g. the final slice of the PREVIOUS
    // commit's drain) would deliver it whole — the exact batch the
    // opt-in exists to prevent. It must defer one trigger and split.
    freshWh("tcCdcRlsB")
    cowTable("tcCdcRlsB")                                    // seq 2: 30 deletes
    spark.sql("DELETE FROM tcCdcRlsB.st.t WHERE id >= 50")   // seq 3: 10 deletes
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Long)]()
    val q = spark.readStream.format("graft-cdc")
      .option("table", "tcCdcRlsB.st.t")
      .option("start-seq", "1")
      .option("max-rows-per-trigger", "10")
      .option("split-row-level", "true")
      .load()
      .writeStream.foreachBatch(collector(seen))
      .outputMode("append").start()
    try q.processAllAvailable()
    finally { q.stop(); graft.streaming.Hygiene.unload(q.runId) }
    import scala.jdk.CollectionConverters._
    val byBatch = seen.asScala.toSeq.groupBy(_._4).toSeq.sortBy(_._1).map(_._2)
    assert(byBatch.forall(_.size <= 10),
      s"a batch exceeded the rows cap: ${byBatch.map(_.size)}")
    assert(byBatch.forall(b =>
        b.forall(_._1 < 30) || b.forall(_._1 >= 50)),
      s"a batch mixed two row-level commits' rows: ${byBatch.map(_.map(_._1))}")
    assert(seen.asScala.forall(r => r._2 == "delete" && r._3 == 1),
      "every slice is an ordinal-1 delete of its own commit")
    assert(seen.asScala.map(_._1).toSet ==
      ((0L until 30L) ++ (50L until 60L)).toSet, "rows lost or duplicated")
  }

  test("unit lifecycle on the source directly: slices, loud lost-dir failure, commit deletes the delivered unit") {
    freshWh("tcCdcRlsU")
    cowTable("tcCdcRlsU")
    val ops = new graft.catalog.TableOps("/tmp/graft_test_tcCdcRlsU", "st/t")
    val spill = java.nio.file.Files.createTempDirectory("graft_rls_spill").toString
    val src = new graft.streaming.GraftCdcSource(spark, ops, ops.refresh().get._2, 1L,
      maxRowsPerTrigger = Some(10L), splitRowLevel = true,
      rowLevelSpillRoot = Some(spill))
    val lim = src.getDefaultReadLimit
    // trigger 1: materialize + first slice
    val o1 = src.latestOffset(CdcOffset(1), lim).asInstanceOf[CdcOffset]
    assert(o1.seq == 2 && o1.fileIdx > 0 && o1.unit == "rows",
      s"first rows slice: $o1")
    val unitDir = new java.io.File(s"$spill/seq-2")
    assert(unitDir.isDirectory, "unit not materialized")
    // the materialized unit IS the commit's change rows, file-capped
    val spilled = spark.read.parquet(unitDir.toString)
    assert(spilled.count() == 30, "materialized unit must hold the full diff")
    assert(spilled.columns.contains("_change_type"))
    // drain to completion: every step a bounded slice, then pure-seq
    var cur = o1; var slices = 1
    val firstSlice = o1
    while (cur.fileIdx >= 0 && slices < 20) {
      cur = src.latestOffset(cur, lim).asInstanceOf[CdcOffset]
      if (cur.fileIdx >= 0) slices += 1
    }
    assert(cur == CdcOffset(2), s"drain must end pure-seq: $cur")
    // 30 rows at cap 10 = 3 bounded deliveries: >= 2 mid-drain slice
    // OFFSETS plus the final slice riding the pure-seq batch — a
    // broken admit() packing 15+ rows per slice would emit only 1
    assert(slices >= 2,
      s"30 rows at cap 10 must emit >= 2 mid-drain slice offsets ($slices)")
    // replay-safe deletion: the unit survives every commit whose batch
    // (start = previous end, end = this one) still references it —
    // Spark REPLAYS the last committed batch through getBatch on
    // restart, so deleting eagerly would brick the checkpoint
    src.commit(firstSlice)        // first commit after (re)start: sweep nothing
    assert(unitDir.isDirectory)
    src.commit(CdcOffset(2))      // batch (slice, pure-2) still references unit 2
    assert(unitDir.isDirectory,
      "unit referenced by the last committed batch must survive its commit")
    src.commit(CdcOffset(3))      // batch (pure-2, pure-3) references nothing
    assert(!unitDir.exists(),
      "unit must be deleted once no replayable batch references it")

    // a LOST dir mid-drain fails loudly instead of re-materializing
    // (slice indices cannot re-bind to a fresh nondeterministic write)
    val src2 = new graft.streaming.GraftCdcSource(spark, ops, ops.refresh().get._2, 1L,
      maxRowsPerTrigger = Some(10L), splitRowLevel = true,
      rowLevelSpillRoot = Some(spill))
    val e = intercept[IllegalStateException] {
      src2.getBatch(Some(firstSlice), CdcOffset(2, firstSlice.fileIdx + 1, "rows"))
    }
    assert(e.getMessage.contains("cannot be re-bound"), e.getMessage)
  }

  test("a unit records the cap that sized it; restarting WITHOUT the opt-in still sweeps leftovers") {
    freshWh("tcCdcRlsS")
    cowTable("tcCdcRlsS")
    val ops = new graft.catalog.TableOps("/tmp/graft_test_tcCdcRlsS", "st/t")
    val spill = java.nio.file.Files.createTempDirectory("graft_rls_sweep").toString
    val src = new graft.streaming.GraftCdcSource(spark, ops, ops.refresh().get._2, 1L,
      maxRowsPerTrigger = Some(10L), splitRowLevel = true,
      rowLevelSpillRoot = Some(spill))
    src.latestOffset(CdcOffset(1), src.getDefaultReadLimit): Unit // materializes
    val unitDir = new java.io.File(s"$spill/seq-2")
    assert(unitDir.isDirectory, "unit not materialized")
    // the cap that sized the spill files is recorded beside them —
    // a crash-window reuse under a DIFFERENT max-rows-per-trigger is
    // then detectable (slices pack to the recorded cap, warned)
    assert(unitDir.listFiles().exists(_.getName == "_graft_cap_10"),
      s"cap marker missing: ${unitDir.listFiles().map(_.getName).toList}")

    // restart the SAME checkpoint with split-row-level REMOVED: the
    // sweep is gated on the spill root existing, not on the current
    // opt-in, so the stranded unit still gets cleaned up once no
    // replayable batch references it
    val src2 = new graft.streaming.GraftCdcSource(spark, ops, ops.refresh().get._2, 1L,
      maxRowsPerTrigger = Some(10L), splitRowLevel = false,
      rowLevelSpillRoot = Some(spill))
    src2.commit(CdcOffset(2))   // first commit after restart: sweeps nothing
    src2.commit(CdcOffset(3))   // batch (pure-2, pure-3) references no unit
    assert(!unitDir.exists(),
      "a unit stranded by removing the opt-in must still be swept")
  }
}
