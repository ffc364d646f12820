package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_benford's mechanics: string-based first digits (no
  * log-boundary hazard), the completed 1..9 grid, the positive-cents
  * filter, and the MAD/flag computed against a JVM replica of the
  * quantize-then-sum.
  */
class BenfordSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(values: Seq[Double]) = {
    import spark.implicits._
    EventsOps.benford(values.toDF("value")).collect()
  }

  test("digit extraction, grid completion, zero/negative filter") {
    // cents: 1, 10, 999, 5, plus filtered 0 and -3.00.
    val rows = run(Seq(0.01, 0.10, 9.99, 0.05, 0.0, -3.00))
    assert(rows.length == 9, "grid completes to all nine digits")
    val byDigit = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDigit(1L) == 2L && byDigit(5L) == 1L && byDigit(9L) == 1L)
    assert((2L to 4L).forall(byDigit(_) == 0L) && byDigit(6L) == 0L)
  }

  test("all-digit-1 data flunks with the exact replicated MAD") {
    val rows = run(Seq.fill(100)(1.00))
    val n = 100.0
    val dev9 = (1L to 9L).map { d =>
      val p = math.log10(1 + 1.0 / d)
      val o = if (d == 1) 100.0 else 0.0
      math.round(math.abs(o / n - p) * 1e9)
    }.sum
    val wantMad = BigDecimal(dev9 / 1e9 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.head
    assert(got.getDouble(5) == wantMad, s"mad: ${got.getDouble(5)}")
    assert(got.getLong(6) == 1L, "constant-digit data must flag")
  }
}
