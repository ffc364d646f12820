package graft

import graft.operators.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** ccPointerJump contracts: exact component labels on planted graphs,
  * and the O(log diameter) round count that is the operator's whole
  * reason to exist next to plain propagation.
  */
class CcStarSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("64-node chain: correct labels in O(log d) rounds") {
    import spark.implicits._
    // Path 0-1-2-...-63 (diameter 63) plus an isolated pair (100,101).
    val und = ((0L until 63L).map(i => (i, i + 1)) :+ (100L, 101L))
      .toDF("u", "v")
    val (labels, rounds) = GraphOps.ccPointerJump(und)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 63L).foreach(i => assert(got(i) == 0L, s"node $i"))
    assert(got(100L) == 100L && got(101L) == 100L)
    // Plain propagation needs ~63 rounds here; jumping halves chains
    // every round. 12 is a loose ceiling (observed ~6-8).
    assert(rounds <= 12, s"took $rounds rounds")
  }

  test("multi-component graph matches brute-force components") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // component min 1
      (10L, 12L), (12L, 11L),       // component min 10
      (20L, 21L),                   // component min 20
    )
    val (labels, _) = GraphOps.ccPointerJump(edges.toDF("u", "v"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == exp)
  }
}
