package graft

import graft.operators.AnnOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN semantics pinned against hand-computed structure:
  * [[AnnOps.dbscanFromPairs]] gets brute-force ε-pairs (so the pin is
  * pure density semantics, independent of band recall), and the
  * end-to-end [[AnnOps.dbscanLabels]] runs on planted exact-duplicate
  * clusters — identical vectors have identical hypersignatures, so
  * band collision is guaranteed, not probabilistic.
  */
class DbscanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("core/border/noise/isolated-core semantics from a hand-built pair graph") {
    import spark.implicits._
    // triangle {0,1,2} + border 3 off 0; triangle {4,5,6};
    // isolated 7; star 8-{9,10}: 8 is a core with NO core neighbor
    // (self-labeled singleton cluster), 9/10 its borders.
    val pairs = Seq(
      (0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (8L, 9L), (8L, 10L),
    ).toDF("vec_a", "vec_b")
    val all = (0L to 10L).toDF("vec_id")
    val got = AnnOps.dbscanFromPairs(all, pairs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val want = Map(
      0L -> (3L, 2L, 0L), 1L -> (2L, 2L, 0L), 2L -> (2L, 2L, 0L),
      3L -> (1L, 1L, 0L),
      4L -> (2L, 2L, 4L), 5L -> (2L, 2L, 4L), 6L -> (2L, 2L, 4L),
      7L -> (0L, 0L, -1L),
      8L -> (2L, 2L, 8L), 9L -> (1L, 1L, 8L), 10L -> (1L, 1L, 8L),
    )
    assert(got == want, s"got $got")
  }

  test("end-to-end banded DBSCAN recovers planted exact-duplicate clusters") {
    import spark.implicits._
    def axis(k: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == k) 1.0f else 0.0f)
    // ids 0-2: duplicates on axis 0; 3-5: duplicates on axis 1
    // (cross-cluster cosine 0 < threshold); 6: alone on axis 2.
    val e = Seq(
      (0L, axis(0)), (1L, axis(0)), (2L, axis(0)),
      (3L, axis(1)), (4L, axis(1)), (5L, axis(1)),
      (6L, axis(2)),
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val got = AnnOps.dbscanLabels(spark, e)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val want = Map(
      0L -> (2L, 2L, 0L), 1L -> (2L, 2L, 0L), 2L -> (2L, 2L, 0L),
      3L -> (2L, 2L, 3L), 4L -> (2L, 2L, 3L), 5L -> (2L, 2L, 3L),
      6L -> (0L, 0L, -1L),
    )
    assert(got == want, s"got $got")
  }
}
