package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts for q_scd2 (SCD2 dimension build) and
  * q_ivfpq_search (coarse cells + PQ codes), on real testdata — the
  * invariants below hold for ANY input, so no planted corpus is
  * needed, and the oracle gate separately pins exact values.
  */
class ScdIvfpqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_scd2 builds disjoint contiguous version chains, one current row per user") {
    val rows = SparkEntry.queries("q_scd2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5)))
    val byUser = rows.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions dense from 1
      assert(sorted.map(_._2).toSeq == (1L to vs.length).toSeq, s"user $u")
      // exactly one open (current) interval, and it is the last one
      assert(vs.count(_._5 == 1L) == 1, s"user $u current count")
      assert(sorted.last._5 == 1L && sorted.last._4.isEmpty, s"user $u")
      // each interval closes exactly where the next opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $u gap between v${a._2} and v${b._2}")
        case _ => ()
      }
    }
    // adjacent versions always change type (it is a CHANGE stream)
    val typed = SparkEntry.queries("q_scd2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    typed.values.foreach { vs =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3, s"no-op version for user ${a._1}")
        case _ => ()
      }
    }
  }

  test("q_ivfpq_search recall@10 vs exact L2, and candidates obey cell pruning") {
    val raw = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val exact = raw.keys.filter(_ < 5).map { p =>
      p -> raw.keySet.filter(_ != p).toSeq
        .sortBy(n => (d2(raw(p), raw(n)), n)).take(10).toSet
    }.toMap
    val got = SparkEntry.queries("q_ivfpq_search")(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    // Recall floor: nprobe=4/16 cells AND k=8 coarse codebooks are both
    // approximations; the floor trips if either pruning is broken
    // (random candidates -> ~10/499 = 0.02).
    val recalls = exact.map { case (p, e) =>
      got.getOrElse(p, Set.empty).intersect(e).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.25, s"mean recall@10 $mean; per-probe $recalls")
    // Cell-pruning contract: every returned neighbor lives in one of
    // the probe's nprobe cells (recomputed independently from raw
    // vectors against the same seed centroids).
    val cents = raw.filter(_._1 < 16)
    // Same algebraic form AND the operator's own 6dp rounding
    // (CentAssign.round6 = Spark Round's HALF_UP on the shortest-
    // decimal BigDecimal), so tie boundaries cannot disagree —
    // math.rint is half-even and could flip a metric landing exactly
    // on a .5e-6 boundary.
    def metric(v: Array[Float], ce: Array[Float]): Double = {
      def nsq(a: Array[Float]) =
        a.map(x => x.toDouble * x.toDouble).sum
      val dot = v.zip(ce).map { case (x, y) => x.toDouble * y.toDouble }.sum
      graft.functions.CentAssign.round6(nsq(v) - 2.0 * dot + nsq(ce))
    }
    def cellOf(v: Array[Float]): Long =
      cents.toSeq.map { case (cid, ce) => (metric(v, ce), cid) }.min._2
    def probedCells(p: Array[Float]): Set[Long] =
      cents.toSeq.map { case (cid, ce) => (metric(p, ce), cid) }
        .sorted.take(4).map(_._2).toSet
    got.foreach { case (p, ns) =>
      val allowed = probedCells(raw(p))
      ns.foreach(n => assert(allowed.contains(cellOf(raw(n))),
        s"probe $p returned neighbor $n outside its probed cells"))
    }
  }
}
