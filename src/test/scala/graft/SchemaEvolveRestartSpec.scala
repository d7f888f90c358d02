package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mid-stream schema-evolution RESTART story, e2e per source.
  * Both sources pin the schema at stream start (MicroBatchExecution
  * aliases batch output to the stream-start attributes BY POSITION, so
  * a silent mid-stream reshape would mislabel data). The CDC source
  * REFUSES the batch and tells the user to restart
  * (CdcSourceSpec pins the refusal); the table-tail source resolves
  * columns by field id, so an added column is simply invisible until
  * restart — no mislabeling is possible either way. What was never
  * pinned before r20: the restart itself — same checkpoint, new
  * schema, EXACT remainder across the seam, no loss, no duplication. */
class SchemaEvolveRestartSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshWh(name: String): String = {
    val wh = s"/tmp/graft_test_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.RelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  /** (id, v-or-None, change_type-or-"", batchId) — schema-aware so one
    * collector serves batches from before AND after the evolution. */
  private def collector(seen: java.util.Queue[(Long, Option[String], String, Long)]) =
    (df: org.apache.spark.sql.DataFrame, batchId: Long) => {
      val hasV = df.schema.fieldNames.contains("v")
      val hasT = df.schema.fieldNames.contains("_change_type")
      df.collect().foreach(r => seen.add((r.getAs[Long]("id"),
        if (hasV) Option(r.getAs[String]("v")) else None,
        if (hasT) r.getAs[String]("_change_type") else "", batchId)))
      (): Unit
    }

  test("graft-cdc: after the mid-stream refusal, a restart on the SAME checkpoint resumes with the new schema and the exact remainder") {
    freshWh("tSchCdc")
    spark.sql("CREATE NAMESPACE tSchCdc.st")
    spark.sql("CREATE TABLE tSchCdc.st.t (id BIGINT)")
    spark.sql("INSERT INTO tSchCdc.st.t SELECT id FROM range(0, 10)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_schcdc_ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[String], String, Long)]()
    def start() = spark.readStream.format("graft-cdc")
      .option("table", "tSchCdc.st.t")
      .load()
      .writeStream.foreachBatch(collector(seen))
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    import scala.jdk.CollectionConverters._
    try {
      q1.processAllAvailable() // genesis (ids 0..9) delivered + committed
      assert(seen.asScala.map(_._1).toSet == (0L until 10L).toSet)
      // evolve + new traffic: the pinned-schema contract fails the
      // NEXT batch loudly (the committed genesis stays committed)
      spark.sql("ALTER TABLE tSchCdc.st.t ADD COLUMN v STRING")
      spark.sql("INSERT INTO tSchCdc.st.t VALUES (100, 'x'), (101, 'y')")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("schema changed mid-stream")),
        messages(e).mkString(" | "))
    } finally { q1.stop(); graft.streaming.Hygiene.unload(q1.runId) }

    // restart on the SAME checkpoint: the new source pins the NEW
    // schema; the remainder is exactly the post-evolution commit —
    // nothing replayed from the committed genesis, nothing lost at the
    // refusal seam
    seen.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      val run2 = seen.asScala.toSet
      assert(run2.map(r => (r._1, r._2, r._3)) ==
        Set((100L, Some("x"), "insert"), (101L, Some("y"), "insert")),
        s"remainder wrong: $run2")
      // and the stream keeps tailing under the new schema
      spark.sql("INSERT INTO tSchCdc.st.t VALUES (102, 'z')")
      q2.processAllAvailable()
      assert(seen.asScala.map(_._1).toSet == Set(100L, 101L, 102L))
    } finally { q2.stop(); graft.streaming.Hygiene.unload(q2.runId) }
  }

  test("table tail: an added column is invisible until restart (id-resolved reads can't mislabel); restart picks it up with no loss/dup") {
    freshWh("tSchTail")
    spark.sql("CREATE NAMESPACE tSchTail.st")
    spark.sql("CREATE TABLE tSchTail.st.t (id BIGINT)")
    spark.sql("INSERT INTO tSchTail.st.t SELECT id FROM range(0, 5)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_schtail_ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[String], String, Long)]()
    def start() = spark.readStream.table("tSchTail.st.t")
      .writeStream.foreachBatch(collector(seen))
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    import scala.jdk.CollectionConverters._
    try {
      q1.processAllAvailable()
      assert(seen.asScala.map(_._1).toSet == (0L until 5L).toSet)
      // evolve mid-stream: new rows keep flowing under the PINNED
      // (old) schema — the added column resolves by field id and is
      // simply not projected; nothing is mislabeled, nothing fails
      spark.sql("ALTER TABLE tSchTail.st.t ADD COLUMN v STRING")
      spark.sql("INSERT INTO tSchTail.st.t VALUES (100, 'x')")
      q1.processAllAvailable()
      val mid = seen.asScala.find(_._1 == 100L).get
      assert(mid._2.isEmpty, s"pre-restart batch must not carry the new column: $mid")
    } finally { q1.stop(); graft.streaming.Hygiene.unload(q1.runId) }

    // restart on the SAME checkpoint: the re-loaded table pins the NEW
    // schema; only post-restart traffic arrives, now with the column
    seen.clear()
    spark.sql("INSERT INTO tSchTail.st.t VALUES (200, 'z')")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val run2 = seen.asScala.toSet
      assert(run2.map(r => (r._1, r._2)) == Set((200L, Some("z"))),
        s"remainder wrong (loss or replay across the restart): $run2")
    } finally { q2.stop(); graft.streaming.Hygiene.unload(q2.runId) }
  }
}
