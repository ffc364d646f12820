package graft

/** Plan-audit utility: print the formatted physical plan of one
  * registered query. Usage: runMain graft.Plan <queryName> [sfDir]
  */
object Plan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_wordcount")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
