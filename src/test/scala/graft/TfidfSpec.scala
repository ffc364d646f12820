package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** q_tfidf on a planted corpus: "zebra" appears only in the two `en`
  * docs, "the" in every doc. IDF must zero out the ubiquitous term and
  * surface the lang-exclusive one.
  */
class TfidfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-tfidf").toString
    Seq(
      (0L, "the zebra zebra runs", "en", "t", 20L),
      (1L, "the zebra zebra sleeps", "en", "t", 22L),
      (2L, "the maison bleue", "fr", "t", 16L),
      (3L, "the maison rouge", "fr", "t", 16L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("lang-exclusive term tops its lang; ubiquitous term scores zero") {
    val rows = SparkEntry.queries("q_tfidf")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val en = rows.filter(_._1 == "en").sortBy(_._4)
    assert(en.head._2 == "zebra")
    // tf("zebra", en)=4, df=2, N=4 => 4·ln(2)
    assert(math.abs(en.head._3 - 4 * math.log(2)) < 1e-6)
    val theScores = rows.filter(_._2 == "the").map(_._3)
    assert(theScores.forall(_ == 0.0), "df == N terms must score ln(1) = 0")
    // top-5 cap and dense 1..k ranks per lang
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.length <= 5)
    }
  }
}
