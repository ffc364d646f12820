package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Cross-checks for GraphOps against independent plain-Scala
  * references (the BpeTrainSpec/WinnowSpec discipline): PageRank vs a
  * sequential loop with the identical 9dp-per-round grid, triangle
  * counts vs an O(V·d²) adjacency-set counter, plus invariants
  * (probability conservation) and the TakeOrderedAndProject plan pin
  * for the top-edge selection.
  */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).doubleValue

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue

  test("q_pagerank matches a sequential reference with the same rounding grid") {
    val edges = operators.GraphOps.edgesOf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val outw = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toDouble
    var r = nodes.map(v => v -> r9(1.0 / n)).toMap
    for (_ <- 1 to 5) {
      val dang = r.filterNot { case (v, _) => outw.contains(v) }.values.sum
      val contrib = edges.groupBy(_._2).map { case (b, es) =>
        b -> es.map { case (a, _, w) => r(a) * (w.toDouble / outw(a)) }.sum
      }
      r = nodes.map { v =>
        v -> r9(0.15 / n + 0.85 * (contrib.getOrElse(v, 0.0) + dang / n))
      }.toMap
    }
    val got = SparkEntry.queries("q_pagerank")(spark, dir)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(got.keySet == r.keySet)
    for ((v, x) <- r) assert(got(v) == r6(x), s"node $v")
  }

  test("q_pagerank conserves probability mass") {
    val total = SparkEntry.queries("q_pagerank")(spark, dir)
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"total rank $total")
  }

  test("q_triangles matches an adjacency-set reference") {
    val top = operators.GraphOps.topEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((a, b) <- top) { adj(a) += b; adj(b) += a }
    val nodes = adj.keys.toSeq.sorted
    val triOf = nodes.map { v =>
      // each of v's triangles = an edge between two of its neighbors
      v -> top.count { case (a, b) => adj(v)(a) && adj(v)(b) }.toLong
    }.toMap
    val got = SparkEntry.queries("q_triangles")(spark, dir).collect()
      .map { case Row(item: Long, deg: Long, nTri: Long, cc: Double) =>
        item -> ((deg, nTri, cc))
      }.toMap
    assert(got.keySet == triOf.keySet)
    for (v <- nodes) {
      val (deg, nTri, cc) = got(v)
      assert(deg == adj(v).size.toLong, s"deg of $v")
      assert(nTri == triOf(v), s"n_tri of $v")
      val expCc = if (deg > 1) r6(2.0 * triOf(v) / (deg * (deg - 1.0))) else 0.0
      assert(cc == expCc, s"clustering of $v")
    }
  }

  test("top-edge selection plans TakeOrderedAndProject, not a global sort") {
    val p = operators.GraphOps.topEdges(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
  }

  test("q_hits matches a sequential reference with the same rounding grid") {
    val edges = operators.GraphOps.edgesOf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var h = nodes.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      val arRaw = nodes.map { v =>
        v -> edges.filter(_._2 == v).map { case (u, _, w) => h(u) * w }.sum
      }.toMap
      val an = arRaw.values.sum
      a = nodes.map(v => v -> r9(arRaw(v) / an)).toMap
      val hrRaw = nodes.map { v =>
        v -> edges.filter(_._1 == v).map { case (_, d, w) => a(d) * w }.sum
      }.toMap
      val hn = hrRaw.values.sum
      h = nodes.map(v => v -> r9(hrRaw(v) / hn)).toMap
    }
    val got = SparkEntry.queries("q_hits")(spark, dir).collect()
      .map { case Row(item: Long, au: Double, hub: Double) =>
        item -> ((au, hub))
      }.toMap
    assert(got.keySet == nodes.toSet)
    for (v <- nodes) {
      assert(got(v)._1 == r6(a(v)), s"authority of $v")
      assert(got(v)._2 == r6(h(v)), s"hub of $v")
    }
  }

  test("q_hits L1 mass: authorities and hubs each sum to ~1") {
    val rows = SparkEntry.queries("q_hits")(spark, dir).collect()
    val (aSum, hSum) =
      (rows.map(_.getDouble(1)).sum, rows.map(_.getDouble(2)).sum)
    assert(math.abs(aSum - 1.0) < 1e-4, s"authority mass $aSum")
    assert(math.abs(hSum - 1.0) < 1e-4, s"hub mass $hSum")
  }

  test("q_link_predict matches an adjacency-set Adamic-Adar reference") {
    val top = operators.GraphOps.topEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((x, y) <- top) { adj(x) += y; adj(y) += x }
    val edgeSet = top.toSet
    val wedges = for {
      z <- adj.keys.toSeq
      ns = adj(z).toSeq.sorted
      i <- ns.indices
      j <- (i + 1) until ns.length
      if !edgeSet((ns(i), ns(j)))
    } yield ((ns(i), ns(j)), z)
    val expected = wedges.groupBy(_._1).map { case (p, zs) =>
      val fp = zs.map { case (_, z) =>
        math.round(r6(1.0 / math.log(adj(z).size.toDouble)) * 1e6)
      }.sum
      (p._1, p._2, zs.size.toLong, r6(fp / 1e6))
    }.toSeq
      .sortBy { case (u, v, _, aa) => (-aa, u, v) }
      .take(20)
    val got = SparkEntry.queries("q_link_predict")(spark, dir).collect()
      .map { case Row(u: Long, v: Long, cn: Long, aa: Double) =>
        (u, v, cn, aa)
      }.toSeq
    assert(got == expected)
  }

  test("q_link_predict plans its final cut as TakeOrderedAndProject") {
    val p = SparkEntry.queries("q_link_predict")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
  }

  test("q_anf_reach matches an adjacency-set k-hop closure, sketch flag exact") {
    val edges = operators.GraphOps.edgesOf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((a, b) <- edges) out(a) += b
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var balls = nodes.map(v => v -> Set(v)).toMap
    val expected = scala.collection.mutable.ArrayBuffer(
      (0L, nodes.length.toLong))
    for (i <- 1 to operators.GraphOps.AnfRounds) {
      balls = balls.map { case (v, ball) =>
        v -> (ball ++ out(v).flatMap(balls))
      }
      expected += ((i.toLong, balls.values.map(_.size.toLong).sum))
    }
    val nf = expected.last._2
    val got = SparkEntry.queries("q_anf_reach")(spark, dir).collect()
      .map { case Row(s: Long, n: Long, ratio: Double, flag: Long) =>
        (s, n, ratio, flag)
      }
    assert(got.map(g => (g._1, g._2)).toSeq == expected.toSeq,
      s"pair counts: got ${got.toSeq} want $expected")
    for ((s, n, ratio, flag) <- got) {
      assert(ratio == r6(n.toDouble / nf), s"ratio at round $s")
      assert(flag == 1L,
        s"node-bounded balls must keep the sketch in exact mode (round $s)")
    }
    // the neighborhood function must actually grow on this graph
    assert(expected.head._2 < nf, "rounds must expand reach")
  }

  test("q_harmonic_centrality matches a BFS-distance reference, flags exact") {
    val edges = operators.GraphOps.edgesOf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((a, b) <- edges) out(a) += b
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val K = operators.GraphOps.AnfRounds
    def bfsCounts(v: Long): Seq[Long] = {
      var frontier = Set(v); var seen = Set(v)
      (1 to K).map { _ =>
        frontier = frontier.flatMap(out) -- seen
        seen ++= frontier
        frontier.size.toLong
      }
    }
    val got = SparkEntry.queries("q_harmonic_centrality")(spark, dir)
      .collect().map { r =>
        r.getLong(0) -> ((1 to K).map(i => r.getLong(i)),
          r.getDouble(K + 1), r.getLong(K + 2))
      }.toMap
    assert(got.keySet == nodes.toSet)
    for (v <- nodes) {
      val ns = bfsCounts(v)
      val (gns, h, flag) = got(v)
      assert(gns == ns, s"per-distance counts of $v")
      val expH = r6(ns.zipWithIndex.map { case (n, i) => n.toDouble / (i + 1) }.sum)
      assert(h == expH, s"harmonic of $v")
      assert(flag == 1L, s"exact-mode flag of $v")
    }
  }
}
