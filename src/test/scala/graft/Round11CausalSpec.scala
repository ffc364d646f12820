package graft

import graft.operators.EventsOps
import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite

/** Hand-exact pins for the round-11 causal/nonparametric additions:
  * IV-Wald (perfect compliance makes LATE = ITT / first-stage
  * exactly), sharp RDD (linear sides recover their lines and τ = the
  * planted jump), Mann-Kendall (monotone series hit the closed-form
  * z; a constant series reads NULL), Cochran's Q (uniform incidence
  * reads 0; a 2-treatment design has a hand-exact Q), and
  * Kruskal-Wallis (identical groups read H = 0; maximal separation
  * hits the closed-form tie-corrected H).
  */
class Round11CausalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("iv wald: perfect compliance reads late = itt / first_stage exactly") {
    import spark.implicits._
    // Even users (z=0): one view, no clicks, no spend. Odd users
    // (z=1): one click and one $3.50 purchase. first_stage = 1,
    // itt = 3.5, late = 3.5.
    val rows = (0L until 10L).flatMap { i =>
      if (i % 2 == 0) Seq((i, "view", 0.0))
      else Seq((i, "click", 0.0), (i, "purchase", 3.5))
    }
    val got = EventsOps.ivWald(rows.toDF("user_id", "event_type", "value"))
      .collect()(0)
    assert(got.getLong(0) == 10 && got.getLong(1) == 5)
    assert(got.getDouble(2) == 1.0, s"first_stage ${got.getDouble(2)}")
    assert(got.getDouble(3) == 3.5, s"itt ${got.getDouble(3)}")
    assert(got.getDouble(4) == 3.5, s"late ${got.getDouble(4)}")
  }

  test("iv wald: a zero first stage nulls the late ratio") {
    import spark.implicits._
    val rows = (0L until 6L).map(i => (i, "view", 1.0))
    val got = EventsOps.ivWald(rows.toDF("user_id", "event_type", "value"))
      .collect()(0)
    assert(got.getDouble(2) == 0.0)
    assert(got.isNullAt(4), "late should be NULL with no clicks")
  }

  test("rdd: linear sides with a planted $5 jump read tau = 5 exactly") {
    import spark.implicits._
    // One user per running value r in [250, 750); a single event of
    // (100.00 + 0.02·d) dollars left of the cutoff and $5 more on
    // the right. Both side fits are exact, so y0/slope/tau are too.
    val rows = (250L until 750L).map { r =>
      val d = r - 500
      val jump = if (r >= 500) 500L else 0L
      (r, (10000L + 2 * d + jump).toDouble / 100)
    }
    val got = EventsOps.rddSharp(rows.toDF("user_id", "value")).collect()(0)
    assert(got.getLong(0) == 250 && got.getLong(1) == 250)
    assert(got.getDouble(2) == 100.0, s"y0_left ${got.getDouble(2)}")
    assert(got.getDouble(3) == 105.0, s"y0_right ${got.getDouble(3)}")
    assert(got.getDouble(4) == 0.02 && got.getDouble(5) == 0.02)
    assert(got.getDouble(6) == 5.0, s"tau ${got.getDouble(6)}")
  }

  test("mann-kendall: monotone series hit the closed-form z; flat is NULL") {
    import spark.implicits._
    // Ten strictly rising days: S = 45, no ties, 18·Var = 10·9·25 =
    // 2250 → z = 44·sqrt(18/2250) = 3.93548 at 6dp.
    def day(i: Int) = Date.valueOf(f"2024-03-$i%02d")
    val up = (1 to 10).map(i => (day(i), 100L + i)).toDF("day", "tot")
    val gu = EventsOps.mannKendall(up).collect()(0)
    assert(gu.getLong(0) == 10 && gu.getLong(1) == 45)
    assert(gu.getDouble(2) == 3.93548, s"z ${gu.getDouble(2)}")
    assert(gu.getLong(3) == 1 && gu.getLong(4) == 1)
    val down = (1 to 10).map(i => (day(i), 100L - i)).toDF("day", "tot")
    val gd = EventsOps.mannKendall(down).collect()(0)
    assert(gd.getLong(1) == -45 && gd.getDouble(2) == -3.93548)
    val flat = (1 to 10).map(i => (day(i), 7L)).toDF("day", "tot")
    val gf = EventsOps.mannKendall(flat).collect()(0)
    assert(gf.getLong(1) == 0 && gf.isNullAt(2), "flat series → NULL z")
  }

  test("cochran q: degenerate and balanced designs; a 2-treatment exact Q") {
    import spark.implicits._
    // Every user touches both types → qden = kT − ΣL² = 0 (no
    // within-user variation) → Q is NULL, the 0/0 guard.
    val uni = (0L until 4L).flatMap(u => Seq((u, "a"), (u, "b")))
    val gu = EventsOps.cochranQ(uni.toDF("user_id", "event_type"))
      .collect()(0)
    assert(gu.isNullAt(3), "saturated incidence → NULL Q")
    // Equal type marginals with real within-user variation → Q = 0:
    // G_a = G_b = 2, T = 4, ΣL² = 6 → qnum = 0, qden = 2.
    val bal = Seq((0L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    val gb = EventsOps.cochranQ(bal.toDF("user_id", "event_type"))
      .collect()(0)
    assert(gb.getDouble(3) == 0.0, s"balanced Q ${gb.getDouble(3)}")
    // G_a = 5, G_b = 3, T = 8, ΣL² = 3·1 + 1·1 + 2·4 = 12:
    // Q = 1·(2·34 − 64)/(16 − 12) = 1.
    val mix = Seq((0L, "a"), (1L, "a"), (2L, "a"), (3L, "b"),
      (4L, "a"), (4L, "b"), (5L, "a"), (5L, "b"))
    val gm = EventsOps.cochranQ(mix.toDF("user_id", "event_type"))
      .collect()(0)
    assert(gm.getLong(0) == 6 && gm.getLong(1) == 2 && gm.getLong(2) == 1)
    assert(gm.getDouble(3) == 1.0, s"Q ${gm.getDouble(3)}")
  }

  test("kruskal-wallis: identical groups read H = 0; separation is exact") {
    import spark.implicits._
    // Same values in both groups → every rank sum equal → H = 0.
    val same = Seq("a", "b").flatMap(g => Seq(1L, 2L, 3L).map((g, _)))
    val gs = EventsOps.kruskalWallis(same.toDF("g", "v")).collect()(0)
    assert(gs.getDouble(3) == 0.0, s"H ${gs.getDouble(3)}")
    // A = {1,1}, B = {2,2}: doubled ranks 3 and 7, R2 = {6, 14},
    // H = 3·(18+98)/(4·5) − 15 = 2.4; ties = 12, N³−N = 60 →
    // H_corr = 2.4·60/48 = 3.
    val sep = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
    val gp = EventsOps.kruskalWallis(sep.toDF("g", "v")).collect()(0)
    assert(gp.getLong(0) == 2 && gp.getLong(1) == 4)
    assert(gp.getDouble(3) == 2.4, s"H ${gp.getDouble(3)}")
    assert(gp.getDouble(4) == 3.0, s"H_corr ${gp.getDouble(4)}")
  }
}
