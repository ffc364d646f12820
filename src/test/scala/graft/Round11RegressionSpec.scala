package graft

import graft.operators.EventsOps
import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite

/** Hand-exact pins for the round-11 regression additions: OLS normal
  * equations (an exact plane is recovered with R² = 1; collinear
  * features read NULL), IRLS logistic regression (a balanced design
  * has zero score at the origin so the state never moves; a monotone
  * design learns a positive slope), Friedman (perfect within-day
  * agreement hits the closed form χ² = b(k−1) for k = 3; constant
  * blocks read NULL), and Jonckheere-Terpstra (fully separated
  * ascending groups hit the closed-form maximal z; reversing the
  * order mirrors it).
  */
class Round11RegressionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("ols: an exact plane is recovered with r2 = 1") {
    import spark.implicits._
    // y = 500 + 3x + 7z cents on a full 6×5 grid: the fit is exact,
    // so b_hour = 0.03 $/unit, b_dow = 0.07, intercept = $5, R² = 1.
    val rows = for (x <- 0L to 5L; z <- 0L to 4L)
      yield (x, z, 500 + 3 * x + 7 * z)
    val got = EventsOps.olsMulti(rows.toDF("x", "z", "y")).collect()(0)
    assert(got.getLong(0) == 30)
    assert(got.getDouble(1) == 0.03, s"b_hour ${got.getDouble(1)}")
    assert(got.getDouble(2) == 0.07, s"b_dow ${got.getDouble(2)}")
    assert(got.getDouble(3) == 5.0, s"intercept ${got.getDouble(3)}")
    assert(got.getDouble(4) == 1.0, s"r2 ${got.getDouble(4)}")
  }

  test("ols: collinear features read NULL (singular normal equations)") {
    import spark.implicits._
    val rows = (0L to 9L).map(x => (x, 2 * x, 100 + x))
    val got = EventsOps.olsMulti(rows.toDF("x", "z", "y")).collect()(0)
    assert(got.isNullAt(1) && got.isNullAt(2) && got.isNullAt(4))
  }

  test("logreg: balanced design holds the origin; monotone learns b1 > 0") {
    import spark.implicits._
    // Half the labels hit at every x → the score at (0,0) is zero in
    // both components, so all four Newton rounds hold the state and
    // p_noon is exactly 0.5.
    val bal = Seq(0L, 1L).flatMap(x =>
      Seq.fill(2)((x, 1L)) ++ Seq.fill(2)((x, 0L)))
    val gb = EventsOps.logregIrls(bal.toDF("x", "hit")).collect()(0)
    assert(gb.getDouble(2) == 0.0 && gb.getDouble(3) == 0.0)
    assert(gb.getDouble(4) == 0.5, s"p_noon ${gb.getDouble(4)}")
    // 10% hits at x = 0 vs 90% at x = 10: the learned slope must be
    // positive and the noon propensity well above half.
    val mono = (Seq.fill(1)((0L, 1L)) ++ Seq.fill(9)((0L, 0L))) ++
      (Seq.fill(9)((10L, 1L)) ++ Seq.fill(1)((10L, 0L)))
    val gm = EventsOps.logregIrls(mono.toDF("x", "hit")).collect()(0)
    assert(gm.getDouble(3) > 0.3, s"b1 ${gm.getDouble(3)}")
    assert(gm.getDouble(4) > 0.8, s"p_noon ${gm.getDouble(4)}")
  }

  test("friedman: perfect agreement hits chi2 = b(k-1); constant is NULL") {
    import spark.implicits._
    def day(i: Int) = Date.valueOf(f"2024-04-$i%02d")
    // Types a < b < c on every one of 5 days (day-level shifts don't
    // touch within-day ranks): χ² = b(k−1) = 10 for k = 3.
    val agree = (1 to 5).flatMap(d => Seq(
      (day(d), "a", 1000L + d * 100),
      (day(d), "b", 2000L + d * 100),
      (day(d), "c", 3000L + d * 100)))
    val ga = EventsOps.friedman(agree.toDF("day", "g", "tot")).collect()(0)
    assert(ga.getLong(0) == 5 && ga.getLong(1) == 3)
    assert(ga.getDouble(3) == 10.0, s"chi2_f ${ga.getDouble(3)}")
    assert(ga.getLong(5) == 1, "b(k-1) at b=5,k=3 is significant")
    // Every type equal within each day → all ranks tie → den = 0.
    val const = (1 to 5).flatMap(d => Seq("a", "b", "c").map(g =>
      (day(d), g, 500L + d)))
    val gc = EventsOps.friedman(const.toDF("day", "g", "tot")).collect()(0)
    assert(gc.isNullAt(3), "all-tied blocks → NULL chi2")
  }

  test("jonckheere: separated ascending groups hit the closed-form z") {
    import spark.implicits._
    // Groups 0:{1,2} < 1:{3,4} < 2:{5,6}: JT = Σ n_g·n_h = 12 (the
    // maximum), JT×2 = 24; N = 6, Σn² = 12 → num4 = 24,
    // 72·Var = 36·15 − 3·4·7 = 456 → z = 24/(4·√(456/72)) = 2.384158.
    val up = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L),
      (2L, 5L), (2L, 6L))
    val gu = EventsOps.jonckheere(up.toDF("grp", "v")).collect()(0)
    assert(gu.getLong(0) == 3 && gu.getLong(1) == 6)
    assert(gu.getLong(2) == 24, s"jt_x2 ${gu.getLong(2)}")
    assert(gu.getDouble(3) == 2.384158, s"z ${gu.getDouble(3)}")
    assert(gu.getLong(4) == 1)
    // Reversed ordering: JT = 0 → the mirrored negative z.
    val down = up.map { case (g, v) => (2L - g, v) }
    val gd = EventsOps.jonckheere(down.toDF("grp", "v")).collect()(0)
    assert(gd.getLong(2) == 0 && gd.getDouble(3) == -2.384158)
    assert(gd.getLong(4) == 0)
  }
}
