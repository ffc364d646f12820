package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** q_unigram_viterbi contracts: the engine's distributed forward-DP +
  * backward-walk segmentation must equal an independent sequential
  * Viterbi written directly from the recurrence (the BpeTrainSpec
  * discipline), and the emitted pieces must cover every character of
  * every word exactly once.
  */
class UnigramSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Sequential reference: same integer-grid scores, same
    * longer-piece tie rule. Returns the piece multiset of one word. */
  private def viterbiRef(w: String, lp: Map[String, Long]): Seq[String] = {
    val n = w.length
    val dps = Array.fill(n + 1)(Long.MinValue / 4)
    val bps = Array.fill(n + 1)(0)
    dps(0) = 0L
    for (j <- 1 to n) {
      var bs = Long.MinValue / 4
      var bl = 1
      for (l <- 1 to math.min(4, j)) {
        val piece = w.substring(j - l, j)
        lp.get(piece) match {
          case Some(p) =>
            val cand = dps(j - l) + p
            // strictly-greater OR equal-with-longer-piece wins; the
            // loop goes short→long so >= implements "prefer longer"
            if (cand >= bs) { bs = cand; bl = l }
          case None => ()
        }
      }
      dps(j) = bs; bps(j) = bl
    }
    val out = scala.collection.mutable.Buffer[String]()
    var pos = n
    while (pos > 0) {
      val l = bps(pos)
      out += w.substring(pos - l, pos)
      pos -= l
    }
    out.toSeq
  }

  test("engine Viterbi counts equal the sequential reference on planted words") {
    import spark.implicits._
    val words = Seq(("abab", 10L), ("ab", 5L), ("cdcd", 3L), ("abcd", 2L))
      .toDF("w", "freq").localCheckpoint()
    val inv = TextOps.ugInventory(words)
    val lp = inv.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val expected = Seq(("abab", 10L), ("ab", 5L), ("cdcd", 3L), ("abcd", 2L))
      .flatMap { case (w, f) => viterbiRef(w, lp).map(p => (p, f)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = TextOps.ugViterbiEmits(words, inv)
      .groupBy("piece")
      .agg(org.apache.spark.sql.functions.sum("freq").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q_vocab_prune drops exactly K grams and keeps LL finite") {
    val full = SparkEntry.queries("q_vocab_prune")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(full.keySet == Set("full", "pruned"))
    assert(full("full")._1 - full("pruned")._1 == TextOps.UgPruneK)
    // log-likelihoods of a probabilistic segmentation are negative
    assert(full("full")._2 < 0 && full("pruned")._2 < 0)
    assert(!full("full")._2.isNaN && !full("pruned")._2.isNaN)
  }

  test("q_unigram_viterbi conserves characters: Σ n·len(piece) = Σ freq·len(w)") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_unigram_viterbi")(spark, dir).collect()
    val coveredChars = rows.map(r => r.getLong(2) * r.getString(0).length).sum
    val totalChars = TextOps.wpWords(spark, dir)
      .select(sum(col("freq") * length(col("w"))).as("t"))
      .collect()(0).getLong(0)
    assert(coveredChars == totalChars,
      s"covered $coveredChars of $totalChars chars")
    // probabilities renormalize: Σ new_p ≈ 1 on the 6dp grid
    val psum = rows.map(_.getDouble(3)).sum
    assert(math.abs(psum - 1.0) < 1e-3, s"Σ new_p = $psum")
  }
}
