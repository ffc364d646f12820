package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_dsir_select: importance resampling must select by CONTENT
  * similarity to the target LM, not by target label — the property
  * that makes DSIR a curation method rather than a lang filter.
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("target-like content is selected across language labels") {
    import spark.implicits._
    // 150 docs, selection size 100 (DsirK). Target domain is zh.
    //   10 zh docs:  "alpha beta" vocabulary (they DEFINE the target LM)
    //   20 en docs:  same "alpha beta" vocabulary — target-LIKE content
    //  120 fr docs:  disjoint "gamma delta" vocabulary
    // The 30 alpha-beta docs must outrank every gamma-delta doc, so the
    // per-lang rollup must show zh and en fully selected and exactly 70
    // of the fr filler chosen to fill the quota.
    val rows =
      (0 until 10).map(i => (i.toLong, "alpha beta alpha", "zh")) ++
        (0 until 20).map(i => (100L + i, "beta alpha beta", "en")) ++
        (0 until 120).map(i => (1000L + i, "gamma delta gamma delta", "fr"))
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    rows.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_dsir_select")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("zh") == (10L, 10L), "every target doc selected")
    assert(got("en") == (20L, 20L),
      "target-LIKE content selected despite the en label — DSIR ranks " +
        "by content, not language")
    assert(got("fr") == (120L, 70L), "filler fills the remaining quota")
  }
}
