package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Random-walk corpus pins: a two-cycle forces the alternating walk
  * regardless of the draw, dead ends truncate without padding, and the
  * weighted step follows the exact integer inverse-CDF recomputed
  * independently from the same md5 seed.
  */
class RandomWalkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def walks(edges: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    GraphOps.randomWalks(edges.toDF("a", "b", "n"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.sortBy(_._2).map(_._3).toSeq
      }
  }

  test("a two-cycle walks deterministically and a dead end truncates") {
    val w = walks(Seq((5L, 6L, 1L), (6L, 5L, 1L), (7L, 8L, 1L)))
    assert(w(5L) == Seq(5L, 6L, 5L, 6L, 5L), s"${w(5L)}")
    assert(w(6L) == Seq(6L, 5L, 6L, 5L, 6L), s"${w(6L)}")
    assert(w(7L) == Seq(7L, 8L), "dead end must truncate, not pad")
    assert(w(8L) == Seq(8L), "a sink emits only its start row")
  }

  test("the weighted step matches the exact inverse-CDF of the md5 seed") {
    import spark.implicits._
    // 0 -> 1 (w 3), 0 -> 2 (w 1): next = 1 iff md5("0|1|rw") mod 4 < 3
    val w = walks(Seq((0L, 1L, 3L), (0L, 2L, 1L)))
    val x = Seq("0").toDF("s")
      .select((graft.functions.Portable.md5Hash60(
        concat(col("s"), lit("|1|rw"))) % 4).as("x"))
      .collect().head.getLong(0)
    val expectedNext = if (x < 3) 1L else 2L
    assert(w(0L) == Seq(0L, expectedNext), s"${w(0L)} vs x=$x")
  }
}
