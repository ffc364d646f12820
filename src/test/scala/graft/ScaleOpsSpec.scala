package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the scale-machinery operators: the properties
  * the SURVEY §8 notes CLAIM (z-order buckets bound both dimensions;
  * histogram quantiles sit within a bin of the exact answer) asserted
  * on real data, beyond the oracle's value equality.
  */
class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_zorder_layout: every z-bucket bounds BOTH dimensions simultaneously") {
    // 64 buckets fix the top 3 bits of each normalized dim, so a
    // bucket's per-dim span is < 1/8 of the range in 8-bit space —
    // ≤ range/8 + one raw-unit bucket width after denormalization.
    val rows = SparkEntry.queries("q_zorder_layout")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val ckLo = rows.map(_._2).min; val ckHi = rows.map(_._3).max
    val dLo = rows.map(_._4).min; val dHi = rows.map(_._5).max
    val ckBound = (ckHi - ckLo) / 8 + (ckHi - ckLo) / 256 + 2
    val dBound = (dHi - dLo) / 8 + (dHi - dLo) / 256 + 2
    rows.foreach { case (n, cl, ch, dl, dh) =>
      assert(n > 0)
      assert(ch - cl <= ckBound, s"ck span ${ch - cl} > $ckBound in bucket ($cl,$ch)")
      assert(dh - dl <= dBound, s"day span ${dh - dl} > $dBound in bucket ($dl,$dh)")
    }
  }

  test("q_quantile_sketch: estimates sit within one bin width of the exact quantiles") {
    val est = SparkEntry.queries("q_quantile_sketch")(spark, dir).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val xs = Tables.orders(spark, dir).select("o_totalprice").collect()
      .map(_.getDouble(0)).sorted
    val binWidth = (xs.last - xs.head) / 1024.0
    for (p <- Seq(0.5, 0.95, 0.99)) {
      // Exact (lower) quantile; the histogram interpolation must land
      // within one bin of it — the operator's advertised error bound.
      val exact = xs(math.min(xs.length - 1, math.ceil(p * xs.length).toInt - 1))
      assert(math.abs(est(p) - exact) <= binWidth + 1e-6,
        s"p$p est ${est(p)} vs exact $exact (bin width $binWidth)")
    }
  }
}
