package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.streaming.state.GraftStateShim
import org.scalatest.funsuite.AnyFunSuite

/** The round-13 concurrency contract of state-store hygiene: unloading
  * a STOPPED query's providers must not touch a LIVE query's — a
  * global unloadAll here killed concurrent streams mid-commit (the
  * parallel Verify pool) and raced the maintenance task's async
  * self-stop into RejectedExecutionException.
  */
class HygieneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("unload(runId) drops exactly the stopped run's providers; a live stream keeps its state") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]

    def startDedup(ms: MemoryStream[Long], name: String) =
      ms.toDS().dropDuplicates()
        .writeStream.format("memory").queryName(name).outputMode("append").start()

    val ms1 = MemoryStream[Long]
    val ms2 = MemoryStream[Long]
    val q1 = startDedup(ms1, "hyg_q1")
    val q2 = startDedup(ms2, "hyg_q2")
    try {
      ms1.addData(1L, 2L, 2L); q1.processAllAvailable()
      ms2.addData(10L, 11L, 11L); q2.processAllAvailable()
      assert(GraftStateShim.providerCountForRun(q1.runId) > 0, "q1 providers loaded")
      assert(GraftStateShim.providerCountForRun(q2.runId) > 0, "q2 providers loaded")

      q1.stop()
      graft.streaming.Hygiene.unload(q1.runId)
      assert(GraftStateShim.providerCountForRun(q1.runId) == 0,
        "stopped run's providers must be gone")
      assert(GraftStateShim.providerCountForRun(q2.runId) > 0,
        "live run's providers must be untouched")

      // q2's keyed dedup state is intact: a duplicate of an ALREADY
      // SEEN value must still be dropped after q1's unload
      ms2.addData(11L, 12L); q2.processAllAvailable()
      val out2 = spark.table("hyg_q2").collect().map(_.getLong(0)).sorted
      assert(out2.toSeq == Seq(10L, 11L, 12L),
        s"live stream state corrupted by unload: ${out2.mkString(",")}")
    } finally {
      if (q1.isActive) q1.stop()
      q2.stop()
      graft.streaming.Hygiene.unload(q1.runId)
      graft.streaming.Hygiene.unload(q2.runId)
      Seq("hyg_q1", "hyg_q2").foreach(spark.catalog.dropTempView(_): Unit)
    }
  }
}
