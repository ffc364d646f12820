package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_chisq_independence: exact zero on a proportional table, the
  * hand-worked 2×2 χ² = 200/252, and the completed zero-cell grid
  * (a type absent from one arm must contribute its expected count,
  * not vanish).
  */
class ChisqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** rows = (type, #even-user events, #odd-user events). */
  private def chisq(rows: Seq[(String, Int, Int)])
      : (Long, Long, Long, Double, Double) = {
    import spark.implicits._
    val data = rows.flatMap { case (t, even, odd) =>
      Seq.fill(even)((t, 0L)) ++ Seq.fill(odd)((t, 1L))
    }
    val r = EventsOps
      .chisqIndependence(data.toDF("event_type", "user_id"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4),
      r.getDouble(5))
  }

  test("proportional table reads exactly zero") {
    // Both types split 1:2 across arms -> O = E in every cell.
    val (n, nt, df, chi2, v) = chisq(Seq(("a", 10, 20), ("b", 30, 60)))
    assert((n, nt, df) == (120L, 2L, 1L))
    assert(chi2 == 0.0 && v == 0.0)
  }

  test("hand-worked 2x2: chi2 = 200/252, V = sqrt(chi2/n)") {
    // O = [[10,20],[30,40]]: E = [[12,18],[28,42]],
    // chi2 = 4*(1/12+1/18+1/28+1/42) = 200/252 = 0.79365079...
    // per-cell 1e-9 grid: 333333333+222222222+142857143+95238095
    //   = 793650793 -> 0.793651 at 6dp; V = sqrt(0.793650793/100).
    val (n, nt, df, chi2, v) = chisq(Seq(("a", 10, 20), ("b", 30, 40)))
    assert((n, nt, df) == (100L, 2L, 1L))
    assert(chi2 == 0.793651, s"chi2: $chi2")
    assert(v == math.rint(math.sqrt(0.793650793 / 100) * 1e6) / 1e6,
      s"V: $v")
  }

  test("zero cell contributes its expected count") {
    // Type b never occurs in arm 1: the completed grid must charge
    // the missing cell (O=0, E=r*c/N). O = [[10,10],[10,0]]:
    // r = 20,10; c = 20,10; N = 30.
    // E = [[40/3,20/3],[20/3,10/3]]; chi2 = sum (O-E)^2/E
    //   = (10-40/3)^2/(40/3) + (10-20/3)^2/(20/3)
    //   + (10-20/3)^2/(20/3) + (0-10/3)^2/(10/3)
    //   = 100/120 + 100/60 + 100/60 + 10/3 = 7.5 exactly.
    val (n, nt, df, chi2, _) = chisq(Seq(("a", 10, 10), ("b", 10, 0)))
    assert((n, nt, df) == (30L, 2L, 1L))
    assert(chi2 == 7.5, s"zero-cell chi2: $chi2")
  }
}
