package graft

import graft.operators.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins sccMembership against hand-built digraphs: cycles, bridges,
  * trim chains, and the multi-outer-round shape where a later
  * coloring must peel a second SCC hidden behind a larger-id one.
  * A brute-force mutual-reachability reference (Floyd-Warshall over
  * the tiny node set) confirms every case.
  */
class SccSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def scc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.sccMembership(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Brute-force reference: label = min over mutual-reach set. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val reach = Array.fill(n, n)(false)
    nodes.indices.foreach(i => reach(i)(i) = true)
    edges.filter(e => e._1 != e._2)
      .foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    nodes.map { u =>
      val i = idx(u)
      u -> nodes.filter(v => reach(i)(idx(v)) && reach(idx(v))(i)).min
    }.toMap
  }

  test("cycles, bridge, trim chain") {
    // {1,2,3} cycle -> bridge -> {4,5} cycle; 6 hangs off; 20->21->22
    // is a pure trim chain of singletons.
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (3, 4),
      (4, 5), (5, 4), (5, 6), (20, 21), (21, 22))
    val got = scc(edges)
    assert(got == reference(edges))
    assert(got(1) == 1 && got(2) == 1 && got(3) == 1)
    assert(got(4) == 4 && got(5) == 4)
    assert(got(6) == 6 && got(20) == 20 && got(22) == 22)
  }

  test("SCC hidden behind a larger-id SCC needs a second peel") {
    // A = {10,11} points into B = {8,9}: coloring floods B with 11,
    // whose backward sweep only recovers A — B must fall in round 2.
    val edges = Seq[(Long, Long)]((10, 11), (11, 10), (11, 8),
      (8, 9), (9, 8))
    val got = scc(edges)
    assert(got == reference(edges))
    assert(got(10) == 10 && got(11) == 10)
    assert(got(8) == 8 && got(9) == 8)
  }

  test("two SCCs sharing one color root's flood") {
    // root 99 floods everything; only its own SCC leaves round 1.
    val edges = Seq[(Long, Long)]((99, 1), (1, 99), (99, 50), (50, 60),
      (60, 50), (60, 2), (2, 3), (3, 2))
    val got = scc(edges)
    assert(got == reference(edges))
    assert(got(99) == 1 && got(1) == 1)
    assert(got(50) == 50 && got(60) == 50)
    assert(got(2) == 2 && got(3) == 2)
  }

  test("self-loops and a fully cyclic graph") {
    val ring = (0L until 8L).map(i => (i, (i + 1) % 8)) :+ (3L, 3L)
    val got = scc(ring)
    assert(got == reference(ring))
    assert(got.values.toSet == Set(0L), "one ring SCC labeled 0")
  }
}
