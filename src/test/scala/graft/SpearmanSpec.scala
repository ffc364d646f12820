package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_spearman: ±1 on any monotone/antitone pairing (Pearson
  * would not give 1 on a convex curve), and a hand-ranked tied case.
  */
class SpearmanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rho(rows: Seq[(Long, Long)]): Option[Double] = {
    import spark.implicits._
    val r = EventsOps.spearman(rows.toDF("x", "y")).collect().head
    if (r.isNullAt(1)) None else Some(r.getDouble(1))
  }

  test("monotone curve = 1, antitone = -1, constant = NULL") {
    val xs = (1L to 8L).toSeq
    assert(rho(xs.map(x => (x, x * x))).contains(1.0))
    assert(rho(xs.map(x => (x, 100 - x * x))).contains(-1.0))
    assert(rho(xs.map(x => (x, 7L))).isEmpty, "zero y-variance")
  }

  test("hand-ranked tied case: rho = 60/72") {
    // pairs (1,10),(1,20),(2,20),(3,30): doubled midranks
    // x: 3,3,6,8; y: 2,5,5,8 -> n=4, num = 4*115-400 = 60,
    // dx = dy = 4*118-400 = 72 -> rho = 0.833333.
    val got = rho(Seq((1L, 10L), (1L, 20L), (2L, 20L), (3L, 30L)))
    assert(got.contains(0.833333), s"rho: $got")
  }
}
