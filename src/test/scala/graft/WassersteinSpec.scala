package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** W1 pins: identical arms give exactly 0, a pure 50-cent translation
  * gives exactly 0.50 (the transport metric's signature property),
  * and a partial move prices the mass moved times the distance.
  */
class WassersteinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def w1(rows: Seq[(String, Long, Double)]): Map[String, Double] = {
    import spark.implicits._
    EventsOps.wasserstein1(rows.toDF("event_type", "user_id", "value"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
  }

  test("zero on identical arms; exact translation; priced partial move") {
    // I: both arms {3.00 x50, 7.00 x50} -> 0.
    // T: arm1 = arm0 + 0.50 -> W1 = 0.50 exactly.
    // P: arm0 all 2.00 (100 rows); arm1 90 at 2.00, 10 at 6.00 ->
    //    10% of mass moved $4 = 0.40.
    def arm(t: String, grp: Int, vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) => (t, (2 * i + grp).toLong, v) }
    val mix = Seq.fill(50)(3.00) ++ Seq.fill(50)(7.00)
    val rows =
      arm("I", 0, mix) ++ arm("I", 1, mix) ++
        arm("T", 0, mix) ++ arm("T", 1, mix.map(_ + 0.50)) ++
        arm("P", 0, Seq.fill(100)(2.00)) ++
        arm("P", 1, Seq.fill(90)(2.00) ++ Seq.fill(10)(6.00))
    val got = w1(rows)
    assert(got("I") == 0.0, s"identical arms: ${got("I")}")
    assert(got("T") == 0.5, s"translation: ${got("T")}")
    assert(got("P") == 0.4, s"partial move: ${got("P")}")
  }
}
