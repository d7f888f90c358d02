// scratch main for plan inspection / repeat timing
package graft
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Dsl.spark()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_cmp", "q_join_multi", "q_join_broadcast", "q_scan_prune", "q_join_theta")
    names.foreach { name =>
      println(s"########## $name")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        println(f"  rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
