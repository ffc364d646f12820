package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_levene_bf: identical deviation profiles read F = 0 exactly
  * whatever the group MEANS are (the point of a spread test), and the
  * whole statistic equals anovaF run on hand-computed deviations.
  */
class LeveneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def bf(rows: Seq[(String, Double)]) = {
    import spark.implicits._
    EventsOps.brownForsythe(rows.toDF("event_type", "value"))
      .collect().head
  }

  test("same spread, different means: F = 0 exactly") {
    // a = {1, 3}, b = {11, 13}: upper medians 3 and 13, deviations
    // {2, 0} both groups -> SSB = 0.
    val r = bf(Seq(("a", 0.01), ("a", 0.03), ("b", 0.11), ("b", 0.13)))
    assert(r.getDouble(4) == 0.0, s"F: ${r.getDouble(4)}")
  }

  test("equals anovaF on hand-computed median deviations") {
    import spark.implicits._
    val rows = Seq(("a", 0.01), ("a", 0.03), ("a", 0.07),
      ("b", 0.10), ("b", 0.22), ("b", 0.22), ("b", 0.40))
    // upper medians: a -> 3 cents, b -> 22 cents.
    val dev = Seq(("a", 0.02), ("a", 0.00), ("a", 0.04),
      ("b", 0.12), ("b", 0.00), ("b", 0.00), ("b", 0.18))
    val got = bf(rows)
    val want = EventsOps.anovaF(dev.toDF("event_type", "value"))
      .collect().head
    assert(got == want, s"$got vs $want")
  }
}
