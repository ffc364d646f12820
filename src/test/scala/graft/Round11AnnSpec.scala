package graft

import graft.operators.AnnOps
import org.scalatest.funsuite.AnyFunSuite

/** Clustering-quality readouts on planted blobs: the elbow curve's
  * inertia must descend monotonically in k and collapse once k
  * reaches the true blob count; simplified silhouette must read
  * near-1 for far tight blobs.
  */
class Round11AnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 64-dim float vector: `base` everywhere, axis 0 offset by c. */
  private def vec(c: Float): Array[Float] =
    Array.tabulate(64)(i => if (i == 0) c else 1.0f)

  // Two far, slightly-jittered blobs at +100 and -100 on axis 0.
  // vec_ids 0/1 land one per blob so the first-k seeds straddle them.
  private def blobs = (0L until 40L).map { i =>
    val c = if (i % 2 == 0) 100.0f else -100.0f
    val jit = (i % 5).toFloat * 0.1f
    (i, vec(c + jit))
  }

  test("elbow: inertia descends in k and collapses at the true blob count") {
    import spark.implicits._
    val got = AnnOps.kmeansElbow(blobs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(2L, 4L, 8L))
    assert(got(2L) >= got(4L) && got(4L) >= got(8L),
      s"inertia must not increase with k: $got")
    // Two true blobs of spread <= 0.4 on one axis: k=2 inertia is
    // already tiny (< 40 points * 0.4^2), vs the ~100^2-scale
    // inertia a single cluster would carry.
    assert(got(2L) < 40 * 0.16 + 1, s"k=2 must resolve the blobs: $got")
  }

  test("silhouette: far tight blobs read mean_sil near 1") {
    import spark.implicits._
    val got = AnnOps.silhouetteOf(blobs.toDF("vec_id", "embedding"), 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.length == 2)
    for ((n, sil) <- got) {
      assert(n == 20, s"balanced blobs: $got")
      assert(sil > 0.99, s"far tight blobs must score ~1: $got")
    }
  }
}
