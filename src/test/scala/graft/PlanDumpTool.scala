package graft

/** Ad-hoc plan inspector (test scope, not shipped): prints the executed
  * plan of the queries named on the command line at sf0.001. */
object PlanDumpTool {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    args.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
