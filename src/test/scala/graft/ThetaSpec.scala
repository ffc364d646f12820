package graft

import graft.functions.Theta
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta-sketch primitives: exact-mode equality, the order/split
  * invariance the oracle gate relies on, set intersection from state
  * alone, and honest estimation-mode error once the nominal-entry
  * budget is exceeded.
  */
class ThetaSpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; Theta.register(s); s }

  test("exact mode: estimate IS the distinct count") {
    import spark.implicits._
    val est = (1L to 1000L).map(i => i % 137).toDF("v")
      .select(expr("theta_estimate(theta_sketch_agg(v))").as("e"))
      .collect()(0).getLong(0)
    assert(est == 137L)
  }

  test("sketch bytes are identical under any partitioning and row order") {
    import spark.implicits._
    val vals = (1L to 3000L).map(i => (i * 2654435761L) % 997)
    def bytesOf(parts: Int, seq: Seq[Long]): Seq[Byte] =
      seq.toDF("v").repartition(parts)
        .select(expr("theta_sketch_agg(v)").as("sk"))
        .collect()(0).getAs[Array[Byte]](0).toSeq
    val a = bytesOf(1, vals)
    val b = bytesOf(7, vals.reverse)
    assert(a == b, "compact sketch must be a pure function of the SET")
  }

  test("intersection from sketches equals the exact overlap in exact mode") {
    import spark.implicits._
    // A = multiples of 2 in [0, 2000), B = multiples of 3: |A∩B| = |mult of 6| = 334
    val df = (0L until 2000L).toDF("v")
    val skA = df.filter(col("v") % 2 === 0)
      .select(expr("theta_sketch_agg(v)").as("sk")).collect()(0).getAs[Array[Byte]](0)
    val skB = df.filter(col("v") % 3 === 0)
      .select(expr("theta_sketch_agg(v)").as("sk")).collect()(0).getAs[Array[Byte]](0)
    assert(Theta.intersectEstimate(skA, skB) == 334L)
    assert(Theta.estimate(skA) == 1000L && Theta.estimate(skB) == 667L)
  }

  test("union of per-slice partials equals the direct single-pass sketch") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i % 10, (i * 31L) % 1200)).toDF("slice", "v")
    val fromPartials = df.groupBy("slice")
      .agg(expr("theta_sketch_agg(v)").as("sk"))
      .select(expr("theta_estimate(theta_union_agg(sk))").as("e"))
      .collect()(0).getLong(0)
    val direct = df.select(expr("theta_estimate(theta_sketch_agg(v))").as("e"))
      .collect()(0).getLong(0)
    assert(fromPartials == direct)
    assert(direct == df.select(countDistinct("v")).collect()(0).getLong(0))
  }

  test("estimation mode: 30k distinct through a 4k-entry sketch lands within 5%") {
    val est = spark.range(30000)
      .select(expr("theta_estimate(theta_sketch_agg(id))").as("e"))
      .collect()(0).getLong(0)
    assert(math.abs(est - 30000L) <= 1500L, s"estimate $est off by >5%")
  }

  test("string inputs hash like any other type") {
    import spark.implicits._
    val est = Seq("a", "b", "a", "c", "b").toDF("v")
      .select(expr("theta_estimate(theta_sketch_agg(v))").as("e"))
      .collect()(0).getLong(0)
    assert(est == 3L)
  }
}
