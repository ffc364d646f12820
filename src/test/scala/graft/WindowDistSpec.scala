package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_window_dist's determinism premise: over a TOTAL order,
  * ntile/percent_rank/cume_dist are pure functions of the row index —
  * hand-checked on planted ties, including the ntile remainder rule
  * (earlier tiles get the extra rows) — and the r11 ROLLUP REWRITE's
  * equivalence: the scale-safe shape (quartile boundaries by exact
  * integer row arithmetic over the (seg, cents) cumulative rollup)
  * must equal the literal window form row-for-row on planted edge
  * cases (N mod 4 ≠ 0, heavy ties straddling quartile boundaries,
  * N < 4, N = 1) AND on the real tables at all three SFs.
  */
class WindowDistSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.mkString("|")).toSeq
  }

  test("ntile remainder rule and exact rank fractions on ties") {
    import spark.implicits._
    // 6 rows, values with ties; total order (v, id). ntile(4) over 6
    // rows -> tile sizes 2,2,1,1 (remainder to the front).
    val df = Seq((100L, 1L), (100L, 2L), (200L, 3L), (200L, 4L),
      (300L, 5L), (300L, 6L)).toDF("v", "id")
    val w = Window.orderBy(col("v"), col("id"))
    val got = df.select(col("id"), ntile(4).over(w).as("q"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val n = 6.0
    // THE point of the total order: value ties are split by id, so
    // every row is its own peer group and percent_rank = (i-1)/(n-1),
    // cume_dist = i/n — pure functions of the row index i.
    val want = Seq(
      (1L, 1, 0.0 / 5, 1 / n), (2L, 1, 1.0 / 5, 2 / n),
      (3L, 2, 2.0 / 5, 3 / n), (4L, 2, 3.0 / 5, 4 / n),
      (5L, 3, 4.0 / 5, 5 / n), (6L, 4, 5.0 / 5, 6 / n))
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }

  test("rollup rewrite equals the window form on planted edge cases") {
    import spark.implicits._
    // Segments exercising every boundary rule: a (remainder 2, ties
    // straddling the q1/q2 and q3/q4 boundaries), b (N=3 < tiles),
    // c (N=1 — the percent_rank 0/0 seam), d (N=8, all one value).
    val rows0 = Seq(
      ("a", 100L), ("a", 100L), ("a", 100L), ("a", 200L), ("a", 300L),
      ("a", 300L), ("a", 300L), ("a", 300L), ("a", 400L), ("a", 500L),
      ("b", 700L), ("b", 600L), ("b", 700L),
      ("c", 900L),
      ("d", 50L), ("d", 50L), ("d", 50L), ("d", 50L),
      ("d", 50L), ("d", 50L), ("d", 50L), ("d", 50L))
    val o = rows0.zipWithIndex
      .map { case ((s0, tc), i) => (s0, tc, i.toLong) }
      .toDF("seg", "tc", "ok")
    val got = rows(operators.Relational.windowDistRollup(o))
    val want = rows(operators.Relational.windowDistWindowForm(o))
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("rollup rewrite equals the window form at all three SFs") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val o = operators.Relational.segTotals(spark, s"/root/testdata/$sf")
      val got = rows(operators.Relational.windowDistRollup(o))
      val want = rows(operators.Relational.windowDistWindowForm(o))
      assert(got == want, s"$sf: rollup != window form\ngot  $got\nwant $want")
    }
  }
}
