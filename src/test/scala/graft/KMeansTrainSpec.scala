package graft

import graft.operators.AnnOps
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AnnOps.trainKMeans on two planted 64-dim blobs: vectors 0/1 seed
  * k=2, the blobs sit on orthogonal axes, so Lloyd must converge to
  * the blob means and STOP (iterations < maxIters proves the tolerance
  * fired, not the cap).
  */
class KMeansTrainSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("converges to planted blob means before the iteration cap") {
    import spark.implicits._
    def vec(axis: Int, v: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(axis) = v; a
    }
    // Blob A on axis 0 (values 1.0, 1.2, 1.4, 1.6), blob B on axis 1.
    val data = Seq(
      0L -> vec(0, 1.0f), 2L -> vec(0, 1.2f), 4L -> vec(0, 1.4f), 6L -> vec(0, 1.6f),
      1L -> vec(1, 1.0f), 3L -> vec(1, 1.2f), 5L -> vec(1, 1.4f), 7L -> vec(1, 1.6f),
    ).toDF("vec_id", "embedding")

    val (cents, iters, shift) = AnnOps.trainKMeans(data, k = 2, maxIters = 10, tol = 1e-9)
    assert(iters < 10, s"hit the cap instead of converging (shift=$shift)")
    assert(shift < 1e-9)
    val byId = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(byId.keySet == Set(0L, 1L))
    // Seed 0 owns the axis-0 blob, seed 1 the axis-1 blob; converged
    // centroids are the blob means: 1.3 on the blob axis, 0 elsewhere.
    assert(math.abs(byId(0L)(0) - 1.3) < 1e-6 && byId(0L)(1) == 0.0)
    assert(math.abs(byId(1L)(1) - 1.3) < 1e-6 && byId(1L)(0) == 0.0)
  }

  test("degenerate k=1 absorbs everything in one effective step") {
    import spark.implicits._
    val data = Seq(
      0L -> Array.fill(64)(1.0f), 5L -> Array.fill(64)(3.0f),
    ).toDF("vec_id", "embedding")
    val (cents, iters, shift) = AnnOps.trainKMeans(data, k = 1, maxIters = 5, tol = 1e-9)
    assert(iters <= 2 && shift < 1e-9)
    val ce = cents.collect().head.getSeq[Double](1)
    assert(ce.forall(_ == 2.0)) // mean of 1.0 and 3.0 everywhere
  }
}
