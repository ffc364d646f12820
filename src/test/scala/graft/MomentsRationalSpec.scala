package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact-rational moments finishing (r9 ADVICE #1 close-out): the
  * K-anchored DECIMAL(38,0) finish must agree BIT-FOR-BIT with the
  * retired mirrored-IEEE finish on the real events table at all three
  * SFs, keep its central reductions exact on adversarial planted
  * groups (negative sums, constants, two-point distributions with
  * known closed forms), and its anchor must be engine-independent
  * floor division even for negative sums.
  */
class MomentsRationalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("rational == mirrored finish bit-for-bit at sf0.001/0.01/0.1") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val p = EventsOps.momentSums(Tables.events(spark, s"/root/testdata/$sf"))
        .localCheckpoint()
      val a = rows(EventsOps.momentFinish(p))
      val b = rows(EventsOps.momentFinishMirrored(p))
      assert(a == b, s"finishes diverge at $sf:\n$a\nvs\n$b")
    }
  }

  test("planted two-point group recovers the closed-form moments exactly") {
    import spark.implicits._
    // 3:1 mix of c=100 and c=500 cents (values 1.00 / 5.00):
    // mean = 2.00, m2 = 30000 cents² (stddev 1.732051),
    // skew = (p(1-p)(1-2p)) / (p(1-p))^1.5 with p=.25 → 1.154701,
    // ex-kurt = (1-6p(1-p))/(p(1-p)) - 3 → -0.666667.
    val df = (Seq.fill(30)(1.00) ++ Seq.fill(10)(5.00))
      .map(v => ("a", v)).toDF("event_type", "value")
    val r = EventsOps.momentFinish(EventsOps.momentSums(df)).collect()(0)
    assert(r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 1.732051)
    assert(r.getDouble(4) == 1.154701)
    assert(r.getDouble(5) == -0.666667)
  }

  test("constant groups yield stddev 0 and null shape stats (A = 0 exactly)") {
    import spark.implicits._
    val df = Seq.fill(7)(("k", 3.21)).toDF("event_type", "value")
    val r = EventsOps.momentFinish(EventsOps.momentSums(df)).collect()(0)
    assert(r.getDouble(2) == 3.21 && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("negative values: the pmod floor anchor keeps every reduction exact") {
    import spark.implicits._
    // s1 < 0 exercises K = floor(s1/n) != truncate(s1/n): the pmod
    // adjustment makes the numerator exactly divisible, so ANY
    // integer-division convention lands on the same K. Mirror pinned
    // against an independently computed reference.
    val vals = Seq(-5.00, -1.25, -0.50, 2.75, -3.00)
    val df = vals.map(v => ("neg", v)).toDF("event_type", "value")
    val r = EventsOps.momentFinish(EventsOps.momentSums(df)).collect()(0)
    val cs = vals.map(v => math.round(v * 100).toDouble)
    val n = cs.size
    val mean = cs.sum / n
    val m2 = cs.map(c => (c - mean) * (c - mean)).sum / n
    val m3 = cs.map(c => math.pow(c - mean, 3)).sum / n
    val m4 = cs.map(c => math.pow(c - mean, 4)).sum / n
    assert(math.abs(r.getDouble(2) - mean / 100) < 1e-6)
    assert(math.abs(r.getDouble(3) - math.sqrt(m2) / 100) < 1e-6)
    assert(math.abs(r.getDouble(4) - m3 / (m2 * math.sqrt(m2))) < 1e-5)
    assert(math.abs(r.getDouble(5) - (m4 / (m2 * m2) - 3)) < 1e-5)
  }
}
