package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_cohens_kappa's exact algebra: a hand-worked 0.4, perfect
  * agreement = 1, marginal-independent table = exactly 0, and the
  * pe = 1 degenerate NULL.
  */
class KappaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** cells = (la, lb, count) expanded to rows. */
  private def kappa(cells: Seq[(Long, Long, Int)])
      : (Long, Long, Double, Double, Option[Double]) = {
    import spark.implicits._
    val rows = cells.flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }
    val r = TextOps.cohensKappa(rows.toDF("la", "lb")).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("hand-worked 2x2 kappa = 0.4") {
    // O = [[20,5],[10,15]]: N=50, D=35, r=(25,25), c=(30,20),
    // P = 25*30+25*20 = 1250 -> kappa = (50*35-1250)/(2500-1250) = 0.4.
    val (n, d, po, pe, k) = kappa(Seq((1, 1, 20), (1, 0, 5),
      (0, 1, 10), (0, 0, 15)))
    assert((n, d) == (50L, 35L))
    assert(po == 0.7 && pe == 0.5)
    assert(k.contains(0.4), s"kappa: $k")
  }

  test("perfect agreement = 1; independence = exactly 0; pe=1 NULL") {
    assert(kappa(Seq((0, 0, 7), (1, 1, 3)))._5.contains(1.0))
    // O = [[4,6],[6,9]]: every cell equals r*c/N -> kappa = 0/300.
    assert(kappa(Seq((0, 0, 4), (0, 1, 6), (1, 0, 6), (1, 1, 9)))
      ._5.contains(0.0))
    // Both labelers constant: pe = 1 -> NULL.
    assert(kappa(Seq((2, 2, 9)))._5.isEmpty)
  }
}
