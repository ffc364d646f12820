package graft.tools

import org.apache.spark.sql.functions._

/** Round-16 diagnostic (not part of the driver contract): times query
  * PLANNING under the session's injected optimizer batch to expose
  * non-convergence of the "User Provided Optimizers" fixpoint batch.
  * Run: sbt "runMain graft.tools.PlanIterProbe"
  */
object PlanIterProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    if (sys.env.get("PROBE_NO_PRUNE").contains("1")) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(r =>
          r == org.apache.spark.sql.catalyst.optimizer.ColumnPruning ||
          r == org.apache.spark.sql.catalyst.optimizer.CollapseProject)
      println("[probe] pruning rules stripped")
    }
    import spark.implicits._
    // IntervalRuleSpec test-6 reproduction: the NaN/Inf interval join.
    val lrows = Seq(("L0", 0.0, 4000.0), ("Ln", Double.NaN, Double.NaN),
      ("Li", 0.0, Double.PositiveInfinity))
    val rrows = Seq(("R0", 3500.0, 10000.0), ("Rn", 100.0, Double.NaN),
      ("Ri", Double.NegativeInfinity, 50.0))
    val l = lrows.toDF("la", "lo1", "hi1")
    val r = rrows.toDF("rb", "lo2", "hi2")
    val joined = l.join(r,
      col("lo1") <= col("hi2") && col("lo2") <= col("hi1"))
    val t0 = System.nanoTime()
    joined.queryExecution.optimizedPlan
    val t1 = System.nanoTime()
    println(f"[probe] optimize took ${(t1 - t0) / 1e9}%.3f s")
    val t2 = System.nanoTime()
    joined.queryExecution.executedPlan
    val t3 = System.nanoTime()
    println(f"[probe] physical planning took ${(t3 - t2) / 1e9}%.3f s")
    spark.stop()
  }
}
