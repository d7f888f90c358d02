package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The reference's relocation thesis extended to CDC streaming state:
  * a `graft-cdc` checkpoint written against one warehouse location
  * resumes against the MOVED warehouse, because offsets are commit
  * sequence numbers (or (seq, fileIdx, unit) slices of an immutable
  * snapshot) and every path in the metadata is warehouse-relative.
  * Pinned for both the steady tail and — the hard case — a restart
  * MID-GENESIS-DRAIN, where the offset names a file-granular slice
  * that must re-bind to the same files under the new root. */
class CdcRelocationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def register(session: org.apache.spark.sql.SparkSession,
      cat: String, wh: String): Unit = {
    session.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.RelativeCatalog")
    session.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  private def collector(seen: java.util.Queue[(Long, String)]) =
    (df: org.apache.spark.sql.DataFrame, _: Long) => {
      df.collect().foreach(r =>
        seen.add((r.getAs[Long]("id"), r.getAs[String]("_change_type"))))
      (): Unit
    }

  test("CDC checkpoints survive warehouse relocation mid-stream (offsets are seqs, not paths)") {
    val wh1 = "/tmp/graft_test_cdcmv_a"
    val wh2 = "/tmp/graft_test_cdcmv_b"
    Seq(wh1, wh2).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    register(spark, "tcCdcMv", wh1)
    spark.sql("CREATE NAMESPACE tcCdcMv.st")
    spark.sql("CREATE TABLE tcCdcMv.st.t (id BIGINT)")
    (0 until 3).foreach(i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1).writeTo("tcCdcMv.st.t").append())
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcmv_ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def run(session: org.apache.spark.sql.SparkSession): Unit = {
      val q = session.readStream.format("graft-cdc")
        .option("table", "tcCdcMv.st.t")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(collector(seen))
        .outputMode("append").start()
      try q.processAllAvailable()
      finally { q.stop(); graft.streaming.Hygiene.unload(q.runId) }
    }
    run(spark)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.map(_._1).toSet == (0L until 30L).toSet)

    // relocate the whole warehouse; catalog instances are cached per
    // (session, name), so the re-pointed registration needs a fresh
    // session (same catalog NAME keeps the checkpointed binding)
    assert(new java.io.File(wh1).renameTo(new java.io.File(wh2)))
    val s2 = spark.newSession()
    register(s2, "tcCdcMv", wh2)
    s2.sql("DELETE FROM tcCdcMv.st.t WHERE id < 5")
    seen.clear()
    run(s2)
    val got = seen.asScala.toSet
    assert(got == (0L until 5L).map((_, "delete")).toSet,
      s"resume after relocation must deliver exactly the post-checkpoint " +
        s"commit's change rows: $got")
  }

  test("CDC checkpoints survive warehouse relocation MID-GENESIS-DRAIN (slice offsets re-bind exactly)") {
    val wh1 = "/tmp/graft_test_cdcmvg_a"
    val wh2 = "/tmp/graft_test_cdcmvg_b"
    Seq(wh1, wh2).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    register(spark, "tcCdcMvG", wh1)
    spark.sql("CREATE NAMESPACE tcCdcMvG.st")
    spark.sql("CREATE TABLE tcCdcMvG.st.t (id BIGINT)")
    (0 until 6).foreach(i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1).writeTo("tcCdcMvG.st.t").append())
    val gt = spark.sessionState.catalogManager.catalog("tcCdcMvG")
      .asInstanceOf[graft.catalog.RelativeCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("st"), "t"))
      .asInstanceOf[graft.catalog.GraftTable]
    graft.catalog.Maintenance.expireSnapshots(gt.ops, keepLast = 1): Unit
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcmvg_ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def start(session: org.apache.spark.sql.SparkSession, trigger: Option[Trigger]) = {
      val w = session.readStream.format("graft-cdc")
        .option("table", "tcCdcMvG.st.t")
        .option("max-rows-per-trigger", "20")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(collector(seen))
        .outputMode("append")
      trigger.fold(w)(w.trigger).start()
    }
    // isolate exactly one 2-file genesis slice, leaving the offset
    // mid-drain ({"seq":N,"idx":2})
    val q1 = start(spark, Some(Trigger.ProcessingTime("5 minutes")))
    try {
      val commit0 = new java.io.File(s"$ckpt/commits/0")
      val deadline = System.currentTimeMillis() + 120000
      while (!commit0.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(commit0.exists(), "batch 0 never committed")
    } finally { q1.stop(); graft.streaming.Hygiene.unload(q1.runId) }
    import scala.jdk.CollectionConverters._
    val run1 = seen.asScala.map(_._1).toSet
    assert(run1.size == 20, s"run 1 delivered ${run1.size} rows")
    val off0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$ckpt/offsets/0")), "UTF-8")
    assert(off0.contains("\"idx\":2"), s"offset 0 not mid-drain: $off0")

    // move the warehouse UNDER the in-flight drain, then resume from
    // the slice offset against the new root
    assert(new java.io.File(wh1).renameTo(new java.io.File(wh2)))
    val s2 = spark.newSession()
    register(s2, "tcCdcMvG", wh2)
    seen.clear()
    val q2 = start(s2, None)
    try q2.processAllAvailable()
    finally { q2.stop(); graft.streaming.Hygiene.unload(q2.runId) }
    val run2 = seen.asScala.map(_._1).toSet
    assert(run2.intersect(run1).isEmpty,
      "committed genesis slice replayed after relocation")
    assert(run1 ++ run2 == (0L until 60L).toSet,
      s"rows lost across the relocation: ${(run1 ++ run2).size}")
  }
}
