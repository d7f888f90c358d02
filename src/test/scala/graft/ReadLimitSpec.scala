package graft

import graft.streaming.{CdcOffset, CommitsPerTrigger, ReadLimits}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles, ReadMaxRows}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The engine-visible rate-limit contract (SupportsAdmissionControl):
  * both sources ADVERTISE their configured caps via
  * `getDefaultReadLimit` (maxRows/maxFiles/composite — not
  * `allAvailable()`) and derive each trigger's effective caps from the
  * ReadLimit the engine passes BACK to `latestOffset(start, limit)`.
  * The payoff is Trigger.Once: the engine passes `allAvailable()`
  * expecting the whole backlog in one batch, and the sources honor it
  * — a source that re-applied its own caps would stop with backlog
  * still owed (the pre-r19 behavior this spec pins away). */
class ReadLimitSpec extends AnyFunSuite {

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

  test("ReadLimits round-trip: configured caps advertise and decode; allAvailable decodes uncapped; unknown kinds fall back") {
    // advertise
    assert(ReadLimits.configured(None, None) == ReadLimit.allAvailable())
    assert(ReadLimits.configured(Some(3), None).asInstanceOf[ReadMaxFiles].maxFiles == 3)
    assert(ReadLimits.configured(None, Some(7L)).asInstanceOf[ReadMaxRows].maxRows == 7L)
    val comp = ReadLimits.configured(None, Some(7L), Some(2))
    // decode what was advertised → exactly the configured caps
    assert(ReadLimits.caps(comp, None, None, None) == (None, Some(7L), Some(2)))
    assert(ReadLimits.caps(ReadLimits.configured(Some(3), Some(7L)), None, None, None) ==
      (Some(3), Some(7L), None))
    // engine override (Trigger.Once): allAvailable = uncapped, every cap
    assert(ReadLimits.caps(ReadLimit.allAvailable(), Some(3), Some(7L), Some(2)) ==
      (None, None, None))
    // null (no engine limit) and unknown kinds keep the configured caps
    assert(ReadLimits.caps(null, Some(3), Some(7L), Some(2)) == (Some(3), Some(7L), Some(2)))
    assert(ReadLimits.caps(ReadLimit.minRows(5L, 1000L), Some(3), Some(7L), None) ==
      (Some(3), Some(7L), None))
    // composite fail-safe: ONE unrecognized member fails the WHOLE
    // composite back to the configured caps (that member could have
    // been the strictest cap; and a composite of only unrecognized
    // kinds must never decode to fully uncapped)
    assert(ReadLimits.caps(
      ReadLimit.compositeLimit(Array(ReadLimit.maxRows(7L), ReadLimit.minRows(5L, 1000L))),
      Some(3), Some(100L), Some(2)) == (Some(3), Some(100L), Some(2)))
  }

  test("CDC source advertises its configured caps and honors an engine-passed allAvailable mid-backlog") {
    freshWh("tcRlimC")
    spark.sql("CREATE NAMESPACE tcRlimC.st")
    spark.sql("CREATE TABLE tcRlimC.st.t (id BIGINT)")
    (0 until 4).foreach(i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1).writeTo("tcRlimC.st.t").append())
    val ops = gt("tcRlimC").ops
    val src = new graft.streaming.GraftCdcSource(spark, ops, ops.refresh().get._2, 0L,
      maxCommitsPerTrigger = Some(1), maxRowsPerTrigger = Some(10L))
    // advertised: the real caps, composite
    val caps = ReadLimits.caps(src.getDefaultReadLimit, None, None, None)
    assert(caps == (None, Some(10L), Some(1)), s"advertised $caps")
    // passed back (normal trigger): capped to one commit
    val capped = src.latestOffset(CdcOffset(1), src.getDefaultReadLimit)
    assert(capped == CdcOffset(2), s"capped end: $capped")
    // engine override: the whole backlog in one step, caps ignored
    val all = src.latestOffset(CdcOffset(1), ReadLimit.allAvailable())
    assert(all == CdcOffset(4), s"allAvailable end: $all")
  }

  test("engine-passed allAvailable mid-genesis-drain closes the drain in one batch (CDC)") {
    freshWh("tcRlimG")
    spark.sql("CREATE NAMESPACE tcRlimG.st")
    spark.sql("CREATE TABLE tcRlimG.st.t (id BIGINT)")
    (0 until 3).foreach(i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1).writeTo("tcRlimG.st.t").append())
    graft.catalog.Maintenance.expireSnapshots(gt("tcRlimG").ops, keepLast = 1): Unit
    val ops = gt("tcRlimG").ops
    val src = new graft.streaming.GraftCdcSource(spark, ops, ops.refresh().get._2, 0L,
      maxRowsPerTrigger = Some(10L))
    val gseq = ops.refresh().get._2.currentSnapshot.get.sequenceNumber
    // capped trigger 1: a 1-file slice of the genesis state
    val s1 = src.latestOffset(CdcOffset(0), src.getDefaultReadLimit)
    assert(s1 == CdcOffset(gseq, 1), s"first slice: $s1")
    // Trigger.Once-style override mid-drain: pure-seq head, and the
    // batch from the partial start is the remainder in one piece
    val s2 = src.latestOffset(s1, ReadLimit.allAvailable())
    assert(s2 == CdcOffset(gseq), s"uncapped mid-drain end: $s2")
    val rows = src.getBatch(Some(s1.asInstanceOf[CdcOffset]), s2.asInstanceOf[CdcOffset])
      .queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.count()
      }.head
    assert(rows == 20, s"remainder batch carried $rows rows (want 20)")
  }

  test("table-tail stream advertises its configured caps and honors an engine-passed allAvailable") {
    freshWh("tcRlimT")
    spark.sql("CREATE NAMESPACE tcRlimT.st")
    spark.sql("CREATE TABLE tcRlimT.st.t (id BIGINT)")
    (0 until 3).foreach(i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1).writeTo("tcRlimT.st.t").append())
    val t = gt("tcRlimT")
    val stream = new graft.catalog.GraftMicroBatchStream(t,
      new CaseInsensitiveStringMap(Map("max-files-per-trigger" -> "1").asJava),
      t.schema(), Nil)
    val caps = ReadLimits.caps(stream.getDefaultReadLimit, None, None, None)
    assert(caps == (Some(1), None, None), s"advertised $caps")
    import graft.catalog.SeqOffset
    val capped = stream.latestOffset(SeqOffset(1), stream.getDefaultReadLimit)
    assert(capped == SeqOffset(2), s"capped end: $capped")
    val all = stream.latestOffset(SeqOffset(1), ReadLimit.allAvailable())
    assert(all == SeqOffset(3), s"allAvailable end: $all")
  }

  test("Trigger.Once e2e: the whole CDC backlog lands in ONE batch despite configured caps") {
    freshWh("tcRlimO")
    spark.sql("CREATE NAMESPACE tcRlimO.st")
    spark.sql("CREATE TABLE tcRlimO.st.t (id BIGINT)")
    (0 until 3).foreach(i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1).writeTo("tcRlimO.st.t").append())
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-cdc")
      .option("table", "tcRlimO.st.t")
      .option("max-rows-per-trigger", "5")
      .option("max-commits-per-trigger", "1")
      .load()
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
        val n = df.count(); if (n > 0) batches.add(n); (): Unit
      })
      .trigger(onceTrigger)
      .outputMode("append").start()
    try assert(q.awaitTermination(120000), "Trigger.Once query did not stop")
    finally { q.stop(); graft.streaming.Hygiene.unload(q.runId) }
    assert(batches.asScala.toList == List(30L),
      s"Trigger.Once must drain the backlog in one uncapped batch: ${batches.asScala.toList}")
  }

  // Trigger.Once is deprecated (AvailableNow supersedes it) but the
  // engine still dispatches it — and its allAvailable() contract is
  // exactly what this spec exists to pin
  @annotation.nowarn("cat=deprecation")
  private def onceTrigger: org.apache.spark.sql.streaming.Trigger =
    org.apache.spark.sql.streaming.Trigger.Once()
}
