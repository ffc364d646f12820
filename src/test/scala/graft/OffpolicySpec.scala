package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_offpolicy_ips: hand-exact logged/uniform/greedy values, the
  * ESS = matched-support collapse, and the deterministic grid-mean +
  * name tie-break on the greedy argmax.
  */
class OffpolicySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ips(rows: Seq[(String, Double)])
      : (Long, Long, String, Long, Double, Double, Double) = {
    import spark.implicits._
    val r = EventsOps.offpolicyIps(rows.toDF("event_type", "value"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6))
  }

  test("hand-exact arms: logged 2.75, uniform 3.0, greedy = best arm") {
    // A: 10 x 2.00; B: 5 x 4.00; C: 5 x 3.00.
    // v_logged = (20+20+15)/20 = 2.75; v_uniform = (2+4+3)/3 = 3.0;
    // greedy -> B (mean 4.00), ESS = its 5 logged plays.
    val rows = Seq.fill(10)(("A", 2.00)) ++ Seq.fill(5)(("B", 4.00)) ++
      Seq.fill(5)(("C", 3.00))
    val (n, k, best, ess, vl, vu, vg) = ips(rows)
    assert((n, k) == (20L, 3L))
    assert(best == "B" && ess == 5L)
    assert(vl == 2.75 && vu == 3.0 && vg == 4.0)
  }

  test("grid-mean tie breaks by name") {
    val rows = Seq(("z_arm", 5.00), ("a_arm", 5.00))
    val (_, _, best, _, _, _, _) = ips(rows)
    assert(best == "a_arm")
  }
}
