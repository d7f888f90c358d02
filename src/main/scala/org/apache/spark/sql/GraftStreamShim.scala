package org.apache.spark.sql

/** Visibility shim: a V1 streaming Source's getBatch must return a
  * DataFrame whose logical plan is marked isStreaming=true
  * (MicroBatchExecution asserts it), and the only constructor for
  * that — SparkSession.internalCreateDataFrame — is private[sql] in
  * Spark 4. The change-set plan is evaluated lazily: toRdd is a plan
  * handle, no job runs until the micro-batch executes.
  */
object GraftStreamShim {
  def streamingFrom(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
