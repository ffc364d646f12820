package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_anova_f's exact rational SS decomposition: a hand-worked
  * two-group F, the all-equal-means zero, and the single-group NULL.
  */
class AnovaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def anova(rows: Seq[(String, Double)])
      : (Long, Long, Long, Long, Option[Double], Option[Double]) = {
    import spark.implicits._
    val r = EventsOps.anovaF(rows.toDF("event_type", "value"))
      .collect().head
    def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), d(4), d(5))
  }

  test("hand-worked two-group F = 13.5, eta2 = 135/175") {
    // cents groups {100,200,300} and {400,500,600}: means 200/500,
    // grand 350; SSB = 2*3*150^2 = 135000, SSW = 4*100^2 = 40000,
    // df = (1, 4) -> F = 135000/(40000/4) = 13.5;
    // eta2 = 135000/175000 = 0.771429 at 6dp. All S_g^2/n_g exact
    // (remainder 0), so the 1e-9 grid path is a pass-through here.
    val rows = Seq(1.00, 2.00, 3.00).map(("a", _)) ++
      Seq(4.00, 5.00, 6.00).map(("b", _))
    val (k, n, df1, df2, f, eta2) = anova(rows)
    assert((k, n, df1, df2) == (2L, 6L, 1L, 4L))
    assert(f.contains(13.5), s"F: $f")
    assert(eta2.contains(0.771429), s"eta2: $eta2")
  }

  test("identical group means give F = 0; remainder path exact") {
    // Groups {1,3} and {1,3} (cents 100/300): SSB = 0. S_g = 400,
    // S_g^2/n_g = 80000 exact; grand 800^2/4 = 160000 exact.
    val rows = Seq(("a", 1.00), ("a", 3.00), ("b", 1.00), ("b", 3.00))
    val (_, _, _, _, f, eta2) = anova(rows)
    assert(f.contains(0.0), s"F: $f")
    assert(eta2.contains(0.0), s"eta2: $eta2")
    // A non-zero remainder case: {1,2} vs {1,2,4} in cents
    // (S=300,n=2 -> 45000 r0; S=700,n=3 -> 163333+1/3).
    // SSB = 45000 + 163333.333333333 - 1000^2/5 = 8333.333333333;
    // SSW = (10000+40000+10000+40000+160000) - 208333.333333333
    //     = 51666.666666667; F = (8333.3333/1)/(51666.6667/3)
    //     = 0.483871 at 6dp (exact 25000/51666.667*... = 15/31).
    val rows2 = Seq(("a", 1.00), ("a", 2.00),
      ("b", 1.00), ("b", 2.00), ("b", 4.00))
    val (_, _, d1, d2, f2, _) = anova(rows2)
    assert((d1, d2) == (1L, 3L))
    assert(f2.contains(0.483871), s"remainder-path F: $f2")
  }

  test("single group yields NULL F") {
    val (k, _, df1, _, f, _) = anova(Seq(("a", 1.00), ("a", 2.00)))
    assert(k == 1L && df1 == 0L && f.isEmpty)
  }
}
