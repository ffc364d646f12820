package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Hand-exact pins for q_welch_anova: the k = 2 case must equal the
  * squared Welch t on groups whose weights and means sit exactly on
  * the quantization grids, identical groups read F = 0, and
  * zero-variance groups drop from the design.
  */
class WelchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("k = 2 equals the squared Welch t on grid-exact groups") {
    import spark.implicits._
    // A = {0, 2} cents, B = {10, 12} cents: each var = 2, w = 1,
    // means 1 and 11 → t² = (10)²/(1+1) = 50; k = 2 kills the λ
    // denominator correction and df2 = 3/(2·0.75)… per-group λ term
    // = (1−½)²/1 = 0.25 → S = 0.5 → df2 = 3/1.5 = 2.
    val rows = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L))
    val got = EventsOps.welchAnova(rows.toDF("event_type", "c")).collect()(0)
    assert(got.getLong(0) == 2 && got.getLong(1) == 4)
    assert(got.getDouble(3) == 2.0, s"df2 ${got.getDouble(3)}")
    assert(got.getDouble(4) == 50.0, s"F ${got.getDouble(4)}")
  }

  test("identical groups read F = 0; zero-variance groups drop") {
    import spark.implicits._
    val same = Seq("a", "b").flatMap(g => Seq(1L, 3L).map((g, _)))
    val gs = EventsOps.welchAnova(same.toDF("event_type", "c")).collect()(0)
    assert(gs.getDouble(4) == 0.0, s"F ${gs.getDouble(4)}")
    // The constant group contributes no admissible weight: k = 2.
    val mix = Seq(("z", 5L), ("z", 5L)) ++
      Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L))
    val gm = EventsOps.welchAnova(mix.toDF("event_type", "c")).collect()(0)
    assert(gm.getLong(0) == 2, s"k ${gm.getLong(0)}")
    assert(gm.getDouble(4) == 50.0)
  }
}
