package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Power-analysis pins: the closed-form MDE on planted two-point arms,
  * the 1/sqrt(n) scaling law across a 4x sample contrast, and the
  * z-constant's provenance against the engine's own A&S grid.
  */
class PowerMdeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val ZSum = 2.801585 // z_{0.025} + z_{0.20}

  test("closed form on planted arms; 4x sample halves the MDE") {
    import spark.implicits._
    // both arms of each type: half 9.00 / half 11.00 (known variance);
    // type S has 200/arm, type L has 800/arm.
    def arm(t: String, n: Int): Seq[(String, Long, Double)] =
      (0 until n).flatMap(i => Seq(
        (t, 2L * i, if (i % 2 == 0) 9.00 else 11.00),
        (t, 2L * i + 1, if (i % 2 == 0) 9.00 else 11.00)))
    val out = EventsOps.powerMde(
      (arm("S", 200) ++ arm("L", 800)).toDF("event_type", "user_id", "value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(5), r.getLong(7))).toMap
    val (naS, meanS, mdeS, nReqS) = out("S")
    assert(naS == 200L && meanS == 10.0)
    // expected: pooled s2 = sum of per-arm (n*q - s^2)/n over
    // (2n - 2) = 2 * 2e6 / 398 cents^2; mde = ZSum * sqrt(s2*2/n)/100
    val s2S = 4.0e6 / 398.0
    val expS = math.floor(ZSum * math.sqrt(s2S * (2.0 / 200)) / 100 * 1e6
      + 0.5) / 1e6
    assert(math.abs(mdeS - expS) < 2e-6, s"got $mdeS want $expS")
    // n needed for a 1% lift on a $10 mean (10-cent effect):
    // 2 * ZSum^2 * s2 / 100 ~ 1573
    assert(nReqS >= 1570L && nReqS <= 1580L, s"got $nReqS")
    val (naL, _, mdeL, _) = out("L")
    assert(naL == 800L)
    assert(math.abs(mdeS / mdeL - 2.0) < 0.01,
      s"4x the sample must halve the MDE: ${mdeS / mdeL}")
  }

  test("the z-constant matches the engine's own A&S grid") {
    import spark.implicits._
    // two-sided p(1.959964) = 0.05 and p(0.841621) = 0.40 on the
    // q_fdr_bh grid confirm z_{0.025} and z_{0.20} to 6dp — the two
    // summands of 2.801585.
    val got = Seq(1.959964, 0.841621).toDF("z")
      .selectExpr("z", s"${EventsOps.pNorm6Sql("z")} AS p6i")
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(1.959964) == 50000L)
    assert(got(0.841621) == 400000L)
    assert(math.abs(1.959964 + 0.841621 - ZSum) < 1e-9)
  }
}
