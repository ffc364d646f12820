package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_decision_stump: a perfectly separable labeling finds the
  * zero-impurity split with hand-exact counts; a mixed case matches
  * a brute-force reference; grid ties break to the smaller
  * threshold.
  */
class StumpSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def stump(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    EventsOps.decisionStump(rows.toDF("v", "lab")).collect().head
  }

  /** Brute-force best (s, v): maximize S over thresholds. */
  private def ref(rows: Seq[(Long, Long)]): (Long, Double) = {
    val vs = rows.map(_._1).distinct.sorted
    val cands = vs.init.map { t =>
      val (l, r) = rows.partition(_._1 <= t)
      val (pl, ql) = (l.count(_._2 == 1L).toDouble, l.count(_._2 == 0L).toDouble)
      val (pr, qr) = (r.count(_._2 == 1L).toDouble, r.count(_._2 == 0L).toDouble)
      val s = (pl * pl + ql * ql) / (pl + ql) + (pr * pr + qr * qr) / (pr + qr)
      (t, math.round(s * 1e6).toDouble / 1e6)
    }
    cands.maxBy { case (t, s) => (s, -t) }
  }

  test("separable labels find the pure split") {
    // 0-labels at 100/200, 1-labels at 700/900 -> split at 2.00,
    // both sides pure: gini_split = 0, base = 0.5, gain = 0.5.
    val rows = Seq.fill(3)((100L, 0L)) ++ Seq.fill(2)((200L, 0L)) ++
      Seq.fill(4)((700L, 1L)) ++ Seq.fill(1)((900L, 1L))
    val r = stump(rows)
    assert(r.getDouble(0) == 2.0, s"split_at ${r.getDouble(0)}")
    assert((r.getLong(1), r.getLong(2)) == (5L, 5L))
    assert((r.getLong(3), r.getLong(4)) == (0L, 5L))
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.0)
    assert(r.getDouble(7) == 0.5)
  }

  test("mixed labels match the brute-force argmax") {
    val rows = Seq((100L, 0L), (100L, 1L), (200L, 0L), (300L, 1L),
      (300L, 1L), (400L, 0L), (500L, 1L), (500L, 1L), (600L, 0L))
    val (bestV, _) = ref(rows)
    val r = stump(rows)
    assert(r.getDouble(0) == bestV.toDouble / 100,
      s"split_at ${r.getDouble(0)} vs ref $bestV")
  }

  test("grid tie breaks to the smaller threshold") {
    // Symmetric data: thresholds 100 and 200 score identically
    // (1|1 vs 1|1 split of two pure-mixed sides) -> v = 100 wins.
    val rows = Seq((100L, 0L), (200L, 1L), (300L, 0L))
    val r = stump(rows)
    val (bestV, _) = ref(rows)
    assert(r.getDouble(0) == bestV.toDouble / 100)
  }
}
