package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins the cross-engine determinism helpers: exactSum must equal the
  * exact rational sum regardless of partitioning/summation order, and
  * md5Hash60 must stay within its documented 60-bit range.
  */
class PortableSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("exactSum equals the exact rational sum under any partitioning") {
    import spark.implicits._
    val rnd = new Random(7)
    // Currency-like doubles: at most 2 decimals, mixed signs.
    val cents = Seq.fill(5000)(rnd.nextInt(2_000_000) - 1_000_000)
    val exact = cents.map(c => BigDecimal(c)).sum / 100
    for (parts <- Seq(1, 7, 32)) {
      val got = cents.map(_ / 100.0).toDF("x").repartition(parts)
        .agg(Portable.exactSum(col("x")).as("s"))
        .collect().head.getDouble(0)
      assert(BigDecimal(got) == exact, s"parts=$parts")
    }
  }

  test("exactAvg equals exact sum over count") {
    import spark.implicits._
    val xs = Seq(1.01, 2.02, 3.03, -0.5, 10.0)
    val got = xs.toDF("x").agg(Portable.exactAvg(col("x")).as("a"))
      .collect().head.getDouble(0)
    assert(math.abs(got - xs.sum / xs.length) < 1e-9)
  }

  test("md5Hash60 stays in [0, 2^60) and is stable") {
    import spark.implicits._
    val rows = Seq("", "a", "hello world", "ü中")
      .toDF("s")
      .select(Portable.md5Hash60(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(rows.forall(h => h >= 0 && h < (1L << 60)))
    // Regression pin: md5('a') = 0cc175b9c0f1b6a8... → first 15 hex.
    assert(rows(1) == java.lang.Long.parseLong("0cc175b9c0f1b6a", 16))
  }
}
