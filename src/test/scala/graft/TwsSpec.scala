package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState (Spark 4's arbitrary-state API, the successor of
  * mapGroupsWithState): per-user running counters kept in a ValueState
  * backed by the RocksDB state store.
  */
class CountProcessor extends StatefulProcessor[Long, (Long, Double), (Long, Long)]
  with Serializable {
  @transient private var countState: org.apache.spark.sql.streaming.ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    countState = getHandle.getValueState[Long]("n", Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (countState.exists()) countState.get() else 0L) + rows.size
    countState.update(n)
    Iterator.single((key, n))
  }
}

class TwsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("transformWithState running counters equal batch counts") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Tables(spark, TestSpark.sf, "events")
        .select(col("user_id"), col("value")).as[(Long, Double)].collect().toSeq
      implicit val ctx: org.apache.spark.sql.classic.SQLContext =
        spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      val ms = MemoryStream[(Long, Double)]
      val q = ms.toDS()
        .groupByKey(_._1)
        .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n")
        .writeStream.format("memory").queryName("tws_out").outputMode("update").start()
      try {
        val (h1, h2) = evs.splitAt(evs.size / 2)
        ms.addData(h1); q.processAllAvailable()
        ms.addData(h2); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("tws_out").groupBy(col("user_id"))
        .agg(max(col("n")).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = Tables(spark, TestSpark.sf, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
