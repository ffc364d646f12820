package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theil-Sen robustness pin: a planted exact line with ~9% outlier
  * days must be recovered EXACTLY (the median slope never sees the
  * outliers), while OLS on the same data is pulled far off. A second
  * constant type pins the per-type partitioning and the zero-slope
  * path.
  */
class TheilSenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val D0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble

  test("planted line + outlier days: exact slope recovery; OLS is pulled") {
    import spark.implicits._
    // type L: day i (1..20) has one row, value 5.00 + 0.10*i — cents
    // are exact integers 500 + 10i, every line-pair slope is exactly
    // 0.1 $/day. Days 21/22 are 100.00 outliers (2/22 = 9% garbage).
    val rows =
      (1 to 20).map(i => ("L", f"2024-01-$i%02d 12:00:00", 5.00 + 0.10 * i)) ++
        Seq(("L", "2024-01-21 12:00:00", 100.0),
          ("L", "2024-01-22 12:00:00", 100.0)) ++
        (1 to 5).map(i => ("U", f"2024-02-$i%02d 12:00:00", 3.00))
    val df = rows.toDF("event_type", "tss", "value")
      .select(col("event_type"), to_timestamp(col("tss")).as("ts"),
        col("value"))
    val out = EventsOps.theilSen(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val (nDays, nPairs, slope, intercept) = out("L")
    assert(nDays == 22L && nPairs == 231L)
    assert(slope == 0.1, s"median slope must be the exact planted 0.1: $slope")
    // line-day residual: 5 + 0.1i - 0.1*(D0 + i - 1) = 5.1 - 0.1*D0
    assert(math.abs(intercept - (5.1 - 0.1 * D0)) < 1e-6, s"got $intercept")
    // OLS on the same daily means is dragged by the two whale days
    val means = (1 to 20).map(i => (D0 + i - 1, 5.0 + 0.1 * i)) ++
      Seq((D0 + 20, 100.0), (D0 + 21, 100.0))
    val mx = means.map(_._1).sum / means.size
    val my = means.map(_._2).sum / means.size
    val ols = means.map(p => (p._1 - mx) * (p._2 - my)).sum /
      means.map(p => (p._1 - mx) * (p._1 - mx)).sum
    assert(ols > 1.0, s"outliers must pull OLS far above 0.1: $ols")
    // constant type: zero slope, intercept = the constant
    val (nd2, np2, s2, i2) = out("U")
    assert(nd2 == 5L && np2 == 10L && s2 == 0.0 && i2 == 3.0)
  }
}
