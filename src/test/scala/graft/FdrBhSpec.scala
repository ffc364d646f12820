package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Benjamini-Hochberg pins: the mirrored A&S normal-tail grid against
  * published quantiles, the step-up's adaptivity over Bonferroni on
  * hand p-values, and end-to-end planted-lift detection.
  */
class FdrBhSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("the A&S 26.2.17 grid lands on published two-sided quantiles") {
    import spark.implicits._
    val got = Seq(0.0, 1.959964, 2.575829, 3.890592).toDF("z")
      .selectExpr("z", s"${EventsOps.pNorm6Sql("z")} AS p6i")
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.0) == 1000000L)        // p = 1
    assert(got(1.959964) == 50000L)     // p = 0.05
    assert(got(2.575829) == 10000L)     // p = 0.01
    assert(got(3.890592) == 100L)       // p = 1e-4
  }

  test("step-up rejects through rank 3 where Bonferroni stops at 1") {
    import spark.implicits._
    // m=5, alpha=0.05: BH thresholds rk*10000 on the p6i grid.
    // p=(0.001, 0.012, 0.020, 0.9, 1.0): ranks 1-3 all satisfy
    // p <= rk*alpha/m (the step-up climbs THROUGH 0.012 > alpha/m),
    // Bonferroni (p <= 0.01) keeps only the first.
    val scored = Seq(
      ("t1", 10L, 3.2, 1000L), ("t2", 10L, 2.5, 12000L),
      ("t3", 10L, 2.3, 20000L), ("t4", 10L, 0.1, 900000L),
      ("t5", 10L, 0.0, 1000000L),
    ).toDF("event_type", "n", "z", "p6i")
    val out = EventsOps.bhReadout(scored)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(out == Map("t1" -> 1L, "t2" -> 1L, "t3" -> 1L,
      "t4" -> 0L, "t5" -> 0L), s"got $out")
    val bonferroni = scored.filter(col("p6i") * 5 <= 50000).count()
    assert(bonferroni == 1L, "the contrast case must beat Bonferroni")
  }

  test("planted lifts reject, planted nulls survive, end-to-end") {
    import spark.implicits._
    // types A and C get a 50-cent lift on arm 1 (z ~ 5 over the 9/11
    // mix, se = 10 cents); B and D have identical arms (z = 0 exact).
    val rows = for {
      t <- Seq("A", "B", "C", "D")
      i <- 0 until 200
      arm <- Seq(0, 1)
    } yield {
      val base = if (i < 100) 9.00 else 11.00
      val lift = if (arm == 1 && (t == "A" || t == "C")) 0.50 else 0.0
      (t, (2 * i + arm).toLong, base + lift)
    }
    val out = EventsOps.fdrBhCurve(
      rows.toDF("event_type", "user_id", "value"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getLong(5)))
      .toMap
    assert(out("A")._2 == 1L && out("C")._2 == 1L, s"lifts must reject: $out")
    assert(out("B")._2 == 0L && out("D")._2 == 0L, s"nulls must survive: $out")
    assert(out("B")._1 == 0.0 && out("D")._1 == 0.0, "null z must be exactly 0")
    assert(math.abs(out("A")._1 + 5.0) < 0.5, s"planted z ~ -5: ${out("A")}")
  }
}
