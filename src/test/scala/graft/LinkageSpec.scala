package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fellegi-Sunter pins on a hand-countable block: pattern counts,
  * data-estimated u probabilities, the closed-form weights, and the
  * blocking guarantee (a record in another block pairs with nothing).
  */
class LinkageSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hand-computed patterns, weights, and blocking exclusion") {
    import spark.implicits._
    // block 0: A and B identical (seg X, 100.00 -> band 0, cents 0),
    // C same seg, 600.00 -> band 1, cents 0. Patterns: (1,1,1) x1
    // (A-B), (1,0,1) x2 (A-C, B-C). Block 9: one lone record — the
    // blocking pin: it contributes NO pairs and leaves tp at 3.
    val df = Seq(
      (1L, 0, "X", 100.00), (2L, 0, "X", 100.00), (3L, 0, "X", 600.00),
      (4L, 9, "X", 100.00),
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .select(col("c_custkey"), col("c_nationkey").cast("int")
        .as("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
    val out = Relational.recordLinkage(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4), r.getString(5))).toMap
    assert(out.keySet == Set((1L, 1L, 1L), (1L, 0L, 1L)), s"$out")
    // u from the data: tp=3, agr_seg=3, agr_band=1, agr_c2=3
    val w111 = math.log(0.95 * 3 / 3) + math.log(0.95 * 3 / 1) +
      math.log(0.95 * 3 / 3)
    val w101 = math.log(0.95 * 3 / 3) + math.log(0.05 * 3 / 2) +
      math.log(0.95 * 3 / 3)
    val (n111, g111, d111) = out((1L, 1L, 1L))
    assert(n111 == 1L && math.abs(g111 - w111) < 1e-6 && d111 == "possible",
      s"got ${out((1L, 1L, 1L))} want w=$w111")
    val (n101, g101, d101) = out((1L, 0L, 1L))
    assert(n101 == 2L && math.abs(g101 - w101) < 1e-6 && d101 == "non_match",
      s"got ${out((1L, 0L, 1L))} want w=$w101")
  }
}
