package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_ivfpq_residual vs q_ivfpq_search on real testdata: residual
  * encoding must not LOSE recall at the same cells / probes / codebook
  * budget (on this corpus it strictly gains), and candidates must obey
  * the same cell-pruning contract. Deterministic data, deterministic
  * assertion — no flake margin needed.
  */
class IvfpqResidualSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Total exact-top-10 hits across the 5 probes (integer, so the
    * comparison cannot pick up float-summation noise) plus the raw
    * result sets. */
  private def hitsAt10(q: String): (Int, Map[Long, Set[Long]]) = {
    val raw = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val exact = raw.keys.filter(_ < 5).map { p =>
      p -> raw.keySet.filter(_ != p).toSeq
        .sortBy(n => (d2(raw(p), raw(n)), n)).take(10).toSet
    }.toMap
    val got = SparkEntry.queries(q)(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val hits = exact.map { case (p, e) =>
      got.getOrElse(p, Set.empty).intersect(e).size
    }.sum
    (hits, got)
  }

  test("residual encoding recall@10 >= raw-vector IVF-PQ at the same budget") {
    val (rawHits, _) = hitsAt10("q_ivfpq_search")
    val (resHits, resGot) = hitsAt10("q_ivfpq_residual")
    assert(resHits >= rawHits,
      s"residual hits $resHits < raw hits $rawHits (of 50)")
    assert(resHits >= 13, s"residual recall floor: $resHits/50")
    // Shape contract: every probe returns PqTopK ranked neighbors.
    resGot.values.foreach(ns => assert(ns.size == 10))
  }
}
