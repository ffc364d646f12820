package graft

import org.scalatest.funsuite.AnyFunSuite

/** Waterfilling invariants for q_domain_mix: allocations never exceed
  * a domain's own tokens, uncapped domains keep everything, capped
  * domains share one common level, and the budget is exactly
  * exhausted (up to the λ rounding of the capped set).
  */
class DomainMixSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("q_domain_mix allocations waterfill the 80% budget") {
    val rows = SparkEntry.queries("q_domain_mix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val budget = total * 4 / 5
    // Each allocation is bounded by its own tokens.
    for ((lang, tokens, alloc, _) <- rows)
      assert(alloc <= tokens, s"$lang allocated $alloc > $tokens")
    val capped = rows.filter { case (_, t, a, _) => a < t }
    if (capped.nonEmpty) {
      // All capped domains share one water level λ…
      assert(capped.map(_._3).distinct.length == 1,
        s"capped levels differ: ${capped.mkString(",")}")
      val lam = capped.head._3
      // …every uncapped domain sits at or below it…
      for ((lang, t, a, _) <- rows if a == t)
        assert(t <= lam + 1, s"$lang kept $t whole above the level $lam")
      // …and the budget is exhausted up to λ-rounding across the
      // capped set (each capped alloc is round(λ) for real-valued λ).
      assert(math.abs(rows.map(_._3).sum - budget) <= capped.length,
        s"sum ${rows.map(_._3).sum} vs budget $budget")
    } else {
      // No one capped: the whole corpus fits in the budget.
      assert(total <= budget)
    }
    // frac column is alloc/total at 6dp.
    for ((_, _, a, f) <- rows)
      assert(math.abs(f - a.toDouble / total) < 1e-6)
  }
}
