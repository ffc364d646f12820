package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** q_tok_optimal contracts: the unrolled-DP minimum-piece count must
  * match a sequential reference DP exactly, greedy >= optimal must
  * hold everywhere (it is a theorem — optimal minimizes), and a
  * planted vocabulary where greedy longest-match is strictly
  * suboptimal must show the gap.
  */
class TokOptimalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Sequential reference: min pieces to cover w with pieces (all
    * single chars implicitly in-vocab) of length 1..4. */
  private def optRef(w: String, pieces: Set[String]): Int = {
    val dp = Array.fill(w.length + 1)(Int.MaxValue)
    dp(0) = 0
    for (j <- 1 to w.length; l <- 1 to math.min(4, j)) {
      val piece = w.substring(j - l, j)
      if ((l == 1 || pieces(piece)) && dp(j - l) != Int.MaxValue)
        dp(j) = math.min(dp(j), dp(j - l) + 1)
    }
    dp(w.length)
  }

  /** Sequential greedy longest-match reference. */
  private def greedyRef(w: String, pieces: Set[String]): Int = {
    var pos = 0
    var n = 0
    while (pos < w.length) {
      val l = (4 to 2 by -1)
        .find(l => pos + l <= w.length && pieces(w.substring(pos, pos + l)))
        .getOrElse(1)
      pos += l
      n += 1
    }
    n
  }

  test("planted greedy trap: DP finds the 2-piece split greedy misses") {
    import spark.implicits._
    // Greedy at pos 0 of "abcde" grabs "abc" (longest), stranding
    // "d"+"e" → 3 pieces; optimal is "ab"+"cde" → 2.
    val words = Seq(("abcde", 1L), ("abc", 2L), ("zz", 1L)).toDF("w", "freq")
    val pieces = Seq("abc", "ab", "cde").toDF("piece")
    val opt = TextOps.wpOptimalPieces(words, pieces)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val greedy = TextOps.wpGreedyEmits(words, pieces)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(opt == Map("abcde" -> 2L, "abc" -> 1L, "zz" -> 2L))
    assert(greedy("abcde") == 3L) // the gap the operator exists to expose
    assert(greedy("abc") == 1L && greedy("zz") == 2L)
  }

  test("q_tok_optimal matches the sequential references on the real corpus") {
    val rows = SparkEntry.queries("q_tok_optimal")(spark, dir).collect()
    assert(rows.nonEmpty)
    // Recompute the piece vocab the operator derives, sequentially.
    val words = TextOps.wpWords(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pieceSet = TextOps.wpPieces(
      TextOps.wpWords(spark, dir))
      .collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      val (w, opt, greedy, gap) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(opt == optRef(w, pieceSet).toLong, s"opt of '$w'")
      assert(greedy == greedyRef(w, pieceSet).toLong, s"greedy of '$w'")
      assert(gap == greedy - opt && gap >= 0, s"gap of '$w'")
      assert(words.contains(w))
    }
  }
}
