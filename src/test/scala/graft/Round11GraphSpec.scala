package graft

import graft.operators.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** Hand-exact pins for the round-11 graph additions: the 4-truss
  * peel (a planted clique survives, a bare triangle and a pendant
  * tail do not; fixpoint reached within the unrolled round budget at
  * the driver SFs) and exact truncated Katz (hand-counted path sums
  * on a chain — the dyadic-α integer identity).
  */
class Round11GraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("ktruss: K5 survives with support 3; triangle and tail peel away") {
    import spark.implicits._
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val extra = Seq((10L, 11L), (10L, 12L), (11L, 12L), (5L, 20L))
    val got = GraphOps.ktruss((k5 ++ extra).toDF("wa", "wb"),
        GraphOps.KtrussK, GraphOps.KtrussRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 10, s"K5 must survive whole: ${got.toSeq}")
    assert(got.forall(_._3 == 3L), s"every K5 edge has support 3: ${got.toSeq}")
    assert(got.map(e => (e._1, e._2)).toSet == k5.toSet)
  }

  test("ktruss: the unrolled round budget reaches the fixpoint at driver SFs") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val top = GraphOps.topEdges(spark, s"/root/testdata/$sf")
      def edgeSet(rounds: Int) =
        GraphOps.ktruss(top, GraphOps.KtrussK, rounds)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(edgeSet(GraphOps.KtrussRounds)
          == edgeSet(GraphOps.KtrussRounds + 2),
        s"$sf: peel not settled within ${GraphOps.KtrussRounds} rounds")
    }
  }

  test("katz: hand-counted dyadic path sums on a chain") {
    import spark.implicits._
    val chain = (1L to 4L).map(i => (i, i + 1, 1L))
    val got = GraphOps.katz(chain.toDF("a", "b", "n"), 8L, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // node 5 receives one path of every length 1..4:
    // (8^3 + 8^2 + 8 + 1)/8^4 = 585/4096; node 2 only length 1.
    assert(got(5L) == math.floor(585.0 / 4096 * 1e6 + 0.5) / 1e6, s"$got")
    assert(got(2L) == 0.125 && got(1L) == 0.0, s"$got")
  }
}
