package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exponential-mechanism pins: a peaked utility landscape forces the
  * exact median through ANY noise realization (the utility gap dwarfs
  * the bounded Gumbel range), and the selected winner always equals
  * an independently recomputed argmax of the score landscape.
  */
class DpQuantileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("peaked distribution: utility gap forces the exact median; argmax verified independently") {
    import spark.implicits._
    // P: 200 rows at 5.00, 3 at 9.00 — u(500) = -3, u(900) = -200,
    // score gap 98.5 >> the Gumbel range of the md5 grid
    // (|g| <= -ln(-ln(5e-7)) ~ 14.5), so dp_median = 5.00 for ANY
    // noise. Q: 2+2 rows — tied utility, the draw decides.
    val rows = Seq.fill(200)(("P", 5.00)) ++ Seq.fill(3)(("P", 9.00)) ++
      Seq.fill(2)(("Q", 1.00)) ++ Seq.fill(2)(("Q", 3.00))
    val df = rows.toDF("event_type", "value")
    val out = EventsOps.dpQuantile(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("P") == ((203L, 5.0, 5.0)), s"got ${out("P")}")
    // even n: the engine's order statistic is the UPPER median
    // (rank floor(n/2)+1 — min v with 2*cum >= n+1), here 3.00
    val (nQ, truQ, dpQ) = out("Q")
    assert(nQ == 4L && truQ == 3.0 && (dpQ == 1.0 || dpQ == 3.0))
    // independent argmax over the score landscape (same grid exprs)
    val h = graft.functions.Portable.md5Hash60(
      concat(col("event_type"), lit("|"), col("v").cast("string"),
        lit("|dpq")))
    val land = Seq(("Q", 100L, -2L), ("Q", 300L, -2L)).toDF(
      "event_type", "v", "u")
      .withColumn("g",
        round(-log(-log((h % 999999 + lit(0.5)) / lit(1000000.0))), 6))
      .withColumn("score", round(col("u") * lit(0.5) + col("g"), 6))
      .collect().map(r => (r.getLong(1), r.getDouble(4)))
    val want = land.minBy(p => (-p._2, p._1))._1 / 100.0
    assert(dpQ == want, s"winner must be the score argmax: $dpQ vs $want")
  }
}
