// scratch main for plan inspection
package graft
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Dsl.spark()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    def show(name: String) = {
      val df = SparkEntry.queries(name)(spark, sf)
      println(s"########## $name")
      println(df.queryExecution.executedPlan.toString.take(3500))
    }
    Seq("q_filter_cmp", "q_join_multi", "q_join_broadcast", "q_scan_prune", "q_join_theta").foreach(show)
    spark.stop()
  }
}
