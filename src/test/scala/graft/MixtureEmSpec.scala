package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EM pins: two well-separated planted point masses must be recovered
  * exactly — means at the masses, weights at the mass ratio, and both
  * variances collapsed to the 1-cent² floor.
  */
class MixtureEmSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("two point masses: exact means, weights, and floored variances") {
    import spark.implicits._
    val rows = Seq.fill(300)(2.00) ++ Seq.fill(700)(8.00)
    val out = EventsOps.mixtureEm(rows.toDF("value")).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (pi1, mu1, sd1) = out(1L)
    val (pi2, mu2, sd2) = out(2L)
    assert(mu1 == 2.0 && mu2 == 8.0, s"means must land on the masses: $out")
    assert(pi1 == 0.3 && pi2 == 0.7, s"weights must be the mass ratio: $out")
    assert(sd1 == 0.01 && sd2 == 0.01,
      s"variances must collapse to the 1-cent floor: $out")
  }
}
