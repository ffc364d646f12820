package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_mutual_information: exactly 0 bits on an independent
  * product table, MI = H on a deterministic bijection (normalized
  * MI = 1), and the uniform-2x2 hand value of 1 bit.
  */
class MutualInfoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mi(rows: Seq[(String, Long)])
      : (Double, Double, Double, Option[Double]) = {
    import spark.implicits._
    val r = EventsOps.mutualInformation(rows.toDF("x", "y"))
      .collect().head
    (r.getDouble(1), r.getDouble(2), r.getDouble(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("independent product table reads exactly 0 bits") {
    // p(x,y) = p(x)p(y) cell-for-cell: counts [[2,4],[4,8]].
    val rows = Seq.fill(2)(("a", 0L)) ++ Seq.fill(4)(("a", 1L)) ++
      Seq.fill(4)(("b", 0L)) ++ Seq.fill(8)(("b", 1L))
    val (bits, _, _, norm) = mi(rows)
    assert(bits == 0.0, s"MI: $bits")
    assert(norm.contains(0.0))
  }

  test("bijection: MI = H = 1 bit on a uniform 2x2 diagonal") {
    val rows = Seq.fill(5)(("a", 0L)) ++ Seq.fill(5)(("b", 1L))
    val (bits, hx, hy, norm) = mi(rows)
    assert(bits == 1.0 && hx == 1.0 && hy == 1.0)
    assert(norm.contains(1.0))
  }

  test("constant marginal degenerates the normalizer to NULL") {
    val rows = Seq.fill(4)(("a", 0L)) ++ Seq.fill(4)(("a", 1L))
    val (bits, hx, _, norm) = mi(rows)
    assert(bits == 0.0 && hx == 0.0 && norm.isEmpty)
  }
}
