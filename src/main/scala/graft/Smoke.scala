package graft
import org.apache.spark.sql.SparkSession
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Dsl.spark()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Tables.names) {
      try {
        val df = Tables(spark, "/root/testdata/sf0.001", t)
        println(s"== $t :: ${df.schema.simpleString}")
      } catch { case e: Throwable => println(s"== $t :: FAILED ${e.getMessage.take(300)}") }
    }
    Tables(spark, "/root/testdata/sf0.001", "events").show(3, false)
    spark.stop()
  }
}
