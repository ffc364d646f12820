package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brandes pins on hand-computable graphs: the chain (dependencies
  * accumulate down the path), the diamond (σ splits across two
  * shortest paths and δ halves), and multi-source summation.
  */
class BetweennessSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], seedMod: Int): Map[Long, Double] = {
    import spark.implicits._
    GraphOps.betweenness(edges.toDF("a", "b"), seedMod, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("chain: interior nodes carry the accumulated dependency") {
    // 0 -> 1 -> 2 -> 3, source {0}: delta(2)=1, delta(1)=2
    val bc = run(Seq((0L, 1L), (1L, 2L), (2L, 3L)), 100)
    assert(bc == Map(0L -> 0.0, 1L -> 2.0, 2L -> 1.0, 3L -> 0.0), s"$bc")
  }

  test("diamond: sigma splits over two shortest paths and delta halves") {
    // 0 -> {1,2} -> 3, source {0}: sigma(3)=2, delta(1)=delta(2)=0.5
    val bc = run(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)), 100)
    assert(bc == Map(0L -> 0.0, 1L -> 0.5, 2L -> 0.5, 3L -> 0.0), s"$bc")
  }

  test("multiple sources: dependencies sum across source BFS trees") {
    // 0 -> 7 -> 14 with seedMod 7: all three are sources; only the
    // src-0 tree gives 7 a dependency (1.0), the others none.
    val bc = run(Seq((0L, 7L), (7L, 14L)), 7)
    assert(bc == Map(0L -> 0.0, 7L -> 1.0, 14L -> 0.0), s"$bc")
  }
}
