package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mSPRT always-valid sequential test: a planted 10-cent lift
  * must cross the ln(1/alpha) boundary on a deterministic day and
  * STAY rejected (the monotone running-max guarantee that makes
  * peeking safe), while identical arms never cross.
  */
class MsprtSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 30 days x 200 rows/arm: arm values split 9/11 dollars (sd $1),
    * arm1 shifted by `liftCents`. */
  private def planted(liftCents: Double) = {
    import spark.implicits._
    val rows = for {
      d <- 1 to 30
      i <- 0 until 200
      arm <- Seq(0, 1)
    } yield {
      val base = if (i < 100) 9.00 else 11.00
      val v = base + (if (arm == 1) liftCents / 100.0 else 0.0)
      (f"2024-01-$d%02d 12:00:00", (2 * i + arm).toLong, v)
    }
    rows.toDF("tss", "user_id", "value")
      .select(to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("value"))
  }

  test("a planted 10-cent lift crosses on a fixed day and stays rejected") {
    val out = EventsOps.msprtCurve(planted(10.0))
      .collect().map(r => (r.getLong(5), r.getDouble(2)))
    assert(out.length == 30)
    // delta = mean_a - mean_b = -0.10 dollars from day one, exact
    assert(out.forall(_._2 == -0.1))
    val firstRejected = out.indexWhere(_._1 == 1L) + 1
    // Analytic: lnL(d) ~ 0.5 d^2/(1+d) - 0.5 ln(1+d) crosses ln(20)
    // between d=9 and d=10 for sd=$1, tau=10c, 200/arm/day.
    assert(firstRejected == 10, s"crossing day moved: $firstRejected")
    // always-valid: once rejected, rejected forever (running max)
    assert(out.drop(firstRejected - 1).forall(_._1 == 1L))
  }

  test("identical arms never reject and the running max is monotone") {
    val out = EventsOps.msprtCurve(planted(0.0))
      .collect().map(r => (r.getDouble(4), r.getLong(5)))
    assert(out.forall(_._2 == 0L), "null experiment must never reject")
    assert(out.sliding(2).forall(p => p(0)._1 <= p(1)._1),
      "ln_lambda_max must be non-decreasing")
  }
}
