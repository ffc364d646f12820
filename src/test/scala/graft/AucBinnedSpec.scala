package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The B-bin quantization twins (q_model_auc_binned /
  * q_gini_activity_binned) against their exact counterparts — the
  * approximation-error guarantees that make the binned rows safe to
  * substitute at 100 TB:
  *
  *  - AUC: binning only re-scores pos/neg pairs that share a bin
  *    (bin order = score order for cross-bin pairs), and each such
  *    pair's contribution moves by at most ½ — so
  *    |AUC_B − AUC_exact| ≤ ½·(same-bin pair mass − same-score pair
  *    mass)/(np·nn), the standard bin-width bound, computed here from
  *    the data itself.
  *  - Gini: within-bin equalization is a mean-preserving contraction,
  *    so G_binned ≤ G_exact always.
  *  - Both: the rollup feeding the SinglePartition cumulative window
  *    is ≤ B rows — the whole point of the knob.
  */
class AucBinnedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Cross-class pair mass Σ_k np_k·nn_k of a (churned, k) frame. */
  private def pairMass(keyed: org.apache.spark.sql.DataFrame): Long = keyed
    .groupBy("k")
    .agg(sum(col("churned")).as("p"),
      sum(lit(1L) - col("churned")).as("q"))
    .agg(sum(col("p") * col("q"))).head().getLong(0)

  test("binned AUC is within the half-same-bin-pair-mass bound of exact") {
    val exact = SparkEntry.queries("q_model_auc")(spark, dir).head()
    val binned = SparkEntry.queries("q_model_auc_binned")(spark, dir).head()
    val np = exact.getLong(1).toDouble
    val nn = exact.getLong(2).toDouble
    assert(binned.getLong(0) == exact.getLong(0)) // n_users
    assert(binned.getLong(1) == exact.getLong(1)) // n_pos
    assert(binned.getLong(2) == exact.getLong(2)) // n_neg

    // Same-score and same-bin cross-class pair masses from the data.
    val lab = EventsOps.churnScored(spark, dir).localCheckpoint()
    val ss = pairMass(lab.select(col("churned"), col("score").as("k")))
    val si = lab.select(col("churned"),
      round(col("score") * lit(1000000), 0).cast("long").as("si"))
    val b = si.agg(min(col("si")).as("smin"), max(col("si")).as("smax")).head()
    val (smin, smax) = (b.getLong(0), b.getLong(1))
    assert(smax > smin, "sf0.001 score domain must not be degenerate")
    val sb = pairMass(si.select(col("churned"),
      expr(s"least(${EventsOps.AucBins - 1}," +
        s" ((si - $smin) * ${EventsOps.AucBins}) div ${smax - smin}) ").as("k")))
    assert(sb >= ss, s"same-bin mass $sb must dominate same-score mass $ss")

    val bound = 0.5 * (sb - ss) / (np * nn) + 3e-6 // 6dp rounding slack
    val diff = math.abs(binned.getDouble(4) - exact.getDouble(3))
    assert(diff <= bound, s"|AUC_B - AUC| = $diff exceeds bound $bound")
    // The knob must actually quantize at sf0.001 (B below the distinct
    // score count), not pass through.
    assert(binned.getLong(3) <= EventsOps.AucBins)
    val distinctScores = lab.select("score").distinct().count()
    assert(distinctScores > EventsOps.AucBins,
      s"gate would not exercise quantization: $distinctScores distinct scores")
  }

  test("the AUC error bound holds at any call-site B (4, 8, 64)") {
    // The builders are call-site parameterized (ADVICE #1 closed):
    // any bins value must satisfy the same half-same-bin-pair bound,
    // with the oracle clause derived from the same argument.
    val exact = SparkEntry.queries("q_model_auc")(spark, dir).head()
    val np = exact.getLong(1).toDouble
    val nn = exact.getLong(2).toDouble
    val lab = EventsOps.churnScored(spark, dir).localCheckpoint()
    val ss = pairMass(lab.select(col("churned"), col("score").as("k")))
    val si = lab.select(col("churned"),
      round(col("score") * lit(1000000), 0).cast("long").as("si"))
      .localCheckpoint()
    val b = si.agg(min(col("si")).as("smin"), max(col("si")).as("smax")).head()
    val (smin, smax) = (b.getLong(0), b.getLong(1))
    for (bins <- Seq(4, 8, 64)) {
      val r = EventsOps.modelAucBinned(spark, dir, bins).head()
      assert(r.getLong(3) <= bins, s"B=$bins occupancy ${r.getLong(3)}")
      val sb = pairMass(si.select(col("churned"),
        expr(s"least(${bins - 1}, ((si - $smin) * $bins) div ${smax - smin})")
          .as("k")))
      val bound = 0.5 * (sb - ss) / (np * nn) + 3e-6
      val diff = math.abs(r.getDouble(4) - exact.getDouble(3))
      assert(diff <= bound, s"B=$bins: |diff| $diff > bound $bound")
      // the oracle builder must splice the SAME bins value
      assert(EventsOps.modelAucBinnedSql(bins).contains(s"* $bins) //"))
    }
    // coarser grids can only widen the same-bin mass (bound monotone)
    val sb4 = pairMass(si.select(col("churned"),
      expr(s"least(3, ((si - $smin) * 4) div ${smax - smin})").as("k")))
    val sb64 = pairMass(si.select(col("churned"),
      expr(s"least(63, ((si - $smin) * 64) div ${smax - smin})").as("k")))
    assert(sb4 >= sb64)
  }

  test("binned Gini lower-bounds exact (mean-preserving contraction)") {
    val exact = SparkEntry.queries("q_gini_activity")(spark, dir).head()
    val binned = SparkEntry.queries("q_gini_activity_binned")(spark, dir).head()
    assert(binned.getLong(0) == exact.getLong(0)) // n_users
    assert(binned.getLong(1) == exact.getLong(1)) // total_events
    assert(binned.getLong(2) <= EventsOps.GiniBins)
    assert(binned.getDouble(3) <= exact.getDouble(2) + 2e-6,
      s"G_binned ${binned.getDouble(3)} must not exceed G ${exact.getDouble(2)}")
    // And it should still be a useful estimate, not a degenerate zero.
    assert(binned.getDouble(3) > 0.0)
    // The contraction direction holds at ANY call-site B.
    for (bins <- Seq(2, 64)) {
      val g = EventsOps.giniBinned(spark, dir, bins).head()
      assert(g.getLong(2) <= bins)
      assert(g.getDouble(3) <= exact.getDouble(2) + 2e-6, s"B=$bins")
    }
  }

  test("window input is B-bounded at runtime for both binned twins") {
    import spark.implicits._
    val binnedAuc = SparkEntry.queries("q_model_auc_binned")(spark, dir).head()
    assert(binnedAuc.getLong(3) <= EventsOps.AucBins)
    val binnedGini = SparkEntry.queries("q_gini_activity_binned")(spark, dir).head()
    assert(binnedGini.getLong(2) <= EventsOps.GiniBins)
    // Degenerate one-point score domain collapses to bin 0 (the CASE
    // guard both engines splice).
    val deg = Seq((1L, 5L, 5L, 5L), (0L, 5L, 5L, 5L))
      .toDF("churned", "si", "smin", "smax")
      .select(EventsOps.binOf(8).as("k"))
      .collect().map(_.getLong(0)).toSet
    assert(deg == Set(0L))
  }
}
