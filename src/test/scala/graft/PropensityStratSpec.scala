package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Subclassification pin: activity-confounded assignment (heavy users
  * mostly treated) biases the naive contrast to 137.48 while the
  * stratified estimator recovers the exact 12.5 truth; an all-treated
  * stratum is excluded by the common-support filter and counted.
  */
class PropensityStratSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("stratification removes planted confounding exactly; support filter counts") {
    import spark.implicits._
    // heavy (20 events, band 1): $10/event, +$1 if treated; 160 of
    // 200 treated. light (5 events, band 0): $2/event, +$1 if
    // treated; 40 of 200 treated. True ATE on user totals =
    // 0.5*20 + 0.5*5 = 12.5. Extra all-treated stratum (45 events,
    // band 2) at $7/event has no control -> excluded, counted.
    def users(ids: Seq[Long], nEv: Int, dollars: Double) =
      ids.flatMap(id => Seq.fill(nEv)((id, dollars)))
    val heavyT = users((0 until 160).map(i => 2L * i + 1), 20, 11.00)
    val heavyC = users((0 until 40).map(i => 2L * i), 20, 10.00)
    val lightT = users((160 until 200).map(i => 2L * i + 1), 5, 3.00)
    val lightC = users((40 until 200).map(i => 2L * i), 5, 2.00)
    val extraT = users((200 until 210).map(i => 2L * i + 1), 45, 7.00)
    val df = (heavyT ++ heavyC ++ lightT ++ lightC ++ extraT)
      .toDF("user_id", "value")
    val r = EventsOps.propensityStrat(df).collect().head
    assert(r.getLong(0) == 410L && r.getLong(1) == 3L && r.getLong(2) == 2L,
      s"got $r")
    // naive: treated mean (160*220 + 40*15 + 10*315)/210 = 185.476190,
    // control mean (40*200 + 160*10)/200 = 48 -> 137.476190 biased
    assert(r.getDouble(3) == 137.47619, s"naive: ${r.getDouble(3)}")
    // stratified over supported bands: (200*20 + 200*5)/400 = 12.5
    assert(r.getDouble(4) == 12.5, s"stratified must be exact: ${r.getDouble(4)}")
  }
}
