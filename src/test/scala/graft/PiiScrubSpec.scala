package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_pii_scrub behavioral contracts: the scrub redacts planted PII
  * byte-exactly, leaves clean text untouched, and the query's counts
  * equal the deterministic salt amounts for every doc.
  */
class PiiScrubSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("scrubPii redacts planted emails and phones, leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "reach me at a.b+spam@sub.example.org or +1-555-1234 thanks",
      "no pii here at all",
      "two mails x@y.io and first.last@corp.example.com plus +44-020-7946",
    ).toDF("s").select(TextOps.scrubPii(col("s"))).as[String].collect()
    assert(rows(0) == "reach me at [EMAIL] or [PHONE] thanks")
    assert(rows(1) == "no pii here at all")
    assert(rows(2) == "two mails [EMAIL] and [EMAIL] plus [PHONE]")
  }

  test("query counts equal the deterministic salt for every doc") {
    val got = SparkEntry.queries("q_pii_scrub")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 1 + id % 3, s"doc $id emails")
      assert(r.getLong(2) == 1L, s"doc $id phones")
      assert(!r.getString(3).isEmpty)
    }
  }
}
