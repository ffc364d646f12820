package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** q_lm_score on a planted 2-doc corpus with hand-computed MLE bigram
  * statistics: corpus bigrams are (a,b)x3, (b,a), (b,c), so
  * P(b|a)=3/3, P(a|b)=1/2, P(c|b)=1/2.
  */
class LmScoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("per-doc mean bigram log-likelihood matches hand computation") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-lm").toString
    Seq((0L, "a b a b"), (1L, "a b c"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q_lm_score")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 0: (a,b) ln1 + (b,a) ln(1/2) + (a,b) ln1 over 3 bigrams.
    assert(rows(0L)._1 == 3L)
    assert(rows(0L)._2 == r6(math.log(0.5) / 3))
    // doc 1: (a,b) ln1 + (b,c) ln(1/2) over 2 bigrams.
    assert(rows(1L)._1 == 2L)
    assert(rows(1L)._2 == r6(math.log(0.5) / 2))
  }
}
