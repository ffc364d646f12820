package graft

import graft.operators.EventsOps
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_attribution_removal's counterfactual semantics: a channel
  * that is the SOLE path to conversion carries removal effect 1 and
  * full share; a channel on no converting path carries exactly 0.
  */
class AttributionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("sole-path channel gets all the credit, bystander none") {
    import spark.implicits._
    // Every converting journey is A -> B -> purchase; channel C only
    // ever leads to D (never converts). Removing B kills ALL
    // conversion; removing C changes nothing.
    def journey(u: Long, steps: Seq[String]) =
      steps.zipWithIndex.map { case (t, i) =>
        (u, t, Timestamp.valueOf(s"2024-01-0${i + 1} 00:00:00"),
          u * 10 + i)
      }
    val rows = (1L to 4L).flatMap(u => journey(u, Seq("A", "B", "purchase")))
      .++((5L to 6L).flatMap(u => journey(u, Seq("C", "D"))))
    val got = EventsOps.attributionRemoval(
      rows.toDF("user_id", "event_type", "ts", "event_id"),
      Seq("B", "C"), "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    val (effB, shareB) = got("B")
    val (effC, shareC) = got("C")
    assert(effB == 1.0 && shareB == 1.0, s"B: $effB, $shareB")
    assert(effC == 0.0 && shareC == 0.0, s"C: $effC, $shareC")
  }
}
