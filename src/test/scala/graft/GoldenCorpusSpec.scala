package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Golden-output parity with the reference's own integration tests.
  *
  * Corpus: `src/test/resources/corpus/file01-08` = the reference's
  * `tests/testdata/input/` (public test data). Goldens:
  * `word_count_correct.txt` (266 keys, incl. the empty key with count
  * 9) and `grep_correct.txt` (6 lines). Comparison is
  * order-insensitive, mirroring the reference's
  * `tests/test_integration_03.py:82-92`.
  *
  * Tokenizer contract (reference `tests/testdata/exec/wc_map.sh:12`):
  * split on space/tab, lowercase, KEEP empty tokens (awk prints `$1`
  * even for empty lines, which is where the empty key's count comes
  * from). Spark twin: `split(lower(value), "[ \t]", -1)` + `explode`.
  */
class GoldenCorpusSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val corpusDir = TestSpark.resource("corpus")

  private def golden(name: String): Seq[String] = {
    val src = Source.fromResource(s"golden/$name")
    try src.getLines().toList finally src.close()
  }

  test("word count over the reference corpus matches word_count_correct.txt") {
    val result = spark.read.text(corpusDir)
      .select(explode(split(lower(col("value")), "[ \t]", -1)).as("word"))
      .groupBy("word").count()
      .collect()
      .map(r => s"${r.getString(0)}\t${r.getLong(1)}")
      .toSeq

    val expected = golden("word_count_correct.txt")
    assert(result.sorted == expected.sorted)
    // The reference's signature edge case: the empty key counts 9.
    assert(result.contains("\t9"))
    assert(result.length == 266)
  }

  test("grep over the reference corpus matches grep_correct.txt") {
    // Reference grep_map.py:12-28: strip, skip empty, emit the line if
    // it contains "product" case-insensitively; reducer is identity.
    val result = spark.read.text(corpusDir)
      .select(trim(col("value")).as("line"))
      .filter(col("line") =!= "" && lower(col("line")).contains("product"))
      .collect()
      .map(_.getString(0))
      .toSeq

    val expected = golden("grep_correct.txt")
    assert(result.sorted == expected.sorted)
    assert(result.length == 6)
  }

  test("q_wordcount/q_grep registry queries run nonempty on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("q_wordcount")(spark, dir).count() > 0)
    assert(SparkEntry.queries("q_grep")(spark, dir).count() > 0)
  }
}
