package graft

/** Ad-hoc plan inspector (test scope, not shipped): prints the
  * formatted explain of the queries named on the command line at
  * sf0.001. With -o DIR as the first two args, additionally writes
  * each query's explain to DIR/<query>.txt (the plans/rNN evidence
  * files). */
object PlanDumpTool {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (outDir, queries) = args.toSeq match {
      case Seq("-o", dir, rest @ _*) => (Some(dir), rest)
      case other => (None, other)
    }
    queries.foreach { q =>
      val txt = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"===== $q =====")
      println(txt)
      outDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"$q.txt"), txt)
      }
    }
    spark.stop()
  }
}
