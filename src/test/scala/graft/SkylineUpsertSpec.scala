package graft

import graft.operators.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for q_skyline (sort-based Pareto front == brute-force
  * dominance on planted fronts with duplicates and same-price groups)
  * and q_stream_upsert (multi-batch foreachBatch state maintenance ==
  * the batch changelog compaction, engine-vs-engine).
  */
class SkylineUpsertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("skylineOf == brute-force dominance on a planted front") {
    import spark.implicits._
    // (id, price, size): front is (1.0,5), (2.0,3), (4.0,1) — with a
    // DUPLICATE of the cheap corner (ids 1,2: neither dominates the
    // other), a same-price loser (id 4 at price 2.0 size 4), a
    // same-price duplicate winner pair (ids 5,6), and interior points.
    val pts = Seq(
      (1L, 1.0, 5L), (2L, 1.0, 5L),     // duplicate corner — both stay
      (3L, 1.0, 6L),                    // same-price loser
      (4L, 2.0, 4L),                    // dominated by (2.0, 3)
      (5L, 2.0, 3L), (6L, 2.0, 3L),     // duplicate winners
      (7L, 3.0, 3L),                    // dominated by (2.0, 3)
      (8L, 4.0, 1L),                    // front corner
      (9L, 5.0, 1L),                    // dominated by (4.0, 1)
      (10L, 0.5, 9L),                   // new cheapest — on the front
    ).toDF("p_partkey", "price", "size")
    val got = Relational.skylineOf(pts)
      .collect().map(_.getLong(0)).toSet
    val rows = pts.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val brute = rows.filter { case (_, pp, ps) =>
      !rows.exists { case (_, qp, qs) =>
        qp <= pp && qs <= ps && (qp < pp || qs < ps)
      }
    }.map(_._1).toSet
    assert(got == brute)
    assert(got == Set(1L, 2L, 5L, 6L, 8L, 10L))
  }

  test("q_stream_upsert final state == q_upsert_latest batch compaction") {
    val stream = SparkEntry.queries("q_stream_upsert")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_upsert_latest")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty)
    assert(stream == batch)
  }
}
