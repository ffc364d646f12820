package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_permutation_test: the null case is EXACTLY p = 1 (a zero
  * observed gap is matched by every draw's |gap| >= 0), complete
  * separation leaves no draw extreme (p = 1/200), and the readout is
  * deterministic run-to-run (hash-seeded draws).
  */
class PermutationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def perm(rows: Seq[(Long, Double)])
      : (Long, Long, Long, Long, Double, Double) = {
    import spark.implicits._
    val r = EventsOps.permutationTest(rows.toDF("user_id", "value"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5))
  }

  test("identical arms: every draw is extreme, p = 1 exactly") {
    val rows = (0L until 60L).map(u => (u, 5.00))
    val (na, nb, nValid, nExtreme, obs, p) = perm(rows)
    assert((na, nb) == (30L, 30L))
    assert(obs == 0.0)
    assert(nExtreme == nValid, "zero gap -> every draw ties")
    assert(p == 1.0)
  }

  test("complete separation: no draw beats the observed split") {
    // Even users 10.00, odd users 1.00: the observed parity split IS
    // the |gap|-maximizing labeling; a hash draw matches it only by
    // reproducing the exact partition (or its complement).
    val rows = (0L until 60L).map(u => (u, if (u % 2 == 0) 10.00 else 1.00))
    val (na, nb, nValid, nExtreme, obs, p) = perm(rows)
    assert((na, nb) == (30L, 30L))
    assert(obs == 9.0)
    assert(nExtreme == 0L, s"extreme draws: $nExtreme")
    assert(nValid == EventsOps.PermDraws.toLong)
    assert(p == 0.005, s"p: $p")
  }

  test("deterministic across runs") {
    val rows = (0L until 40L).map(u => (u, (u % 7).toDouble + 0.5))
    assert(perm(rows) == perm(rows))
  }
}
