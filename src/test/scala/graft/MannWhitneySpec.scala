package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_mann_whitney's exact rank algebra against hand-computed
  * cases: complete separation (U = 0, rank-biserial = −1) and a tied
  * sample whose midranks, tie correction, and z are worked by hand in
  * the comments. Arms split on user parity (even = arm 0).
  */
class MannWhitneySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mw(rows: Seq[(String, Long, Double)])
      : Map[String, (Long, Long, Double, Double, Double)] = {
    import spark.implicits._
    EventsOps.mannWhitney(rows.toDF("event_type", "user_id", "value"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))))
      .toMap
  }

  private def arm(t: String, grp: Int, vs: Seq[Double]) =
    vs.zipWithIndex.map { case (v, i) => (t, (2 * i + grp).toLong, v) }

  test("complete separation, tie-corrected z, and the null case") {
    // S: arm0 {1,2,3} all below arm1 {4,5,6}: Ra = 1+2+3 = 6 =
    //    na(na+1)/2, so U = 0 and rank-biserial = 2U/(na·nb) − 1 = −1.
    //    No ties: var = na·nb(N+1)/12 = 9·7/12 = 5.25;
    //    z = (2U − na·nb) / (2√var) = −9/4.58258 = −1.963961 → sig.
    // T: arm0 {1,2,2}, arm1 {2,3}: midranks 1, 3, 3 / 3, 5 →
    //    Ra = 7, Ua = 1, znum = 2−6 = −4; ties Σ(t³−t) = 24;
    //    varnum = 6·(6·5·4 − 24) = 576; var = 576/(12·5·4) = 2.4;
    //    z = −4/(2√2.4) = −1.290994; r_rb = −4/6 = −0.666667.
    // Z: both arms identical {5,5} → varnum = 0 → z NULL (NaN here).
    val rows =
      arm("S", 0, Seq(0.01, 0.02, 0.03)) ++
        arm("S", 1, Seq(0.04, 0.05, 0.06)) ++
        arm("T", 0, Seq(0.01, 0.02, 0.02)) ++
        arm("T", 1, Seq(0.02, 0.03)) ++
        arm("Z", 0, Seq(0.05)) ++ arm("Z", 1, Seq(0.05))
    val got = mw(rows)

    val (sna, snb, su, sr, sz) = got("S")
    assert((sna, snb) == (3L, 3L))
    assert(su == 0.0, s"separated U: $su")
    assert(sr == -1.0, s"separated rank-biserial: $sr")
    assert(sz == -1.963961, s"separated z: $sz")

    val (tna, tnb, tu, tr, tz) = got("T")
    assert((tna, tnb) == (3L, 2L))
    assert(tu == 1.0, s"tied U: $tu")
    assert(tr == -0.666667, s"tied rank-biserial: $tr")
    assert(tz == -1.290994, s"tie-corrected z: $tz")

    val (_, _, _, _, zz) = got("Z")
    assert(zz.isNaN, s"degenerate variance must yield NULL z: $zz")
  }

  test("arm swap negates z and the rank-biserial, U reflects") {
    // Swapping parities maps U → na·nb − U and z → −z exactly.
    val base = arm("A", 0, Seq(0.10, 0.30, 0.70)) ++
      arm("A", 1, Seq(0.20, 0.30, 0.90, 1.10))
    val swapped = base.map { case (t, uid, v) => (t, uid + 1, v) }
    val (na, nb, u1, r1, z1) = mw(base)("A")
    val (swNa, swNb, u2, r2, z2) = mw(swapped)("A")
    assert((swNa, swNb) == (nb, na))
    assert(u1 + u2 == na.toDouble * nb)
    assert(r2 == -r1 && z2 == -z1)
  }
}
