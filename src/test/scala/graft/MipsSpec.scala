package graft

import graft.operators.AnnOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_simsearch_mips: the dot-product ranking diverges from
  * cosine exactly where norms carry signal, and the Bachrach
  * M-augmentation (x → [x, √(M²−|x|²)]) makes cosine order equal
  * dot order — the theorem that lets the cosine ANN infrastructure
  * serve MIPS.
  */
class MipsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("MIPS ranks a big-norm vector over a better-aligned small one") {
    import spark.implicits._
    // probe 0 = [1, 0]. Neighbor 10 = [3, 3] (cos .707, ip 3) must
    // outrank neighbor 11 = [1, 0.1] (cos ~.995, ip 1) under MIPS.
    val e = Seq(
      (0L, Array(1.0f, 0.0f)),
      (10L, Array(3.0f, 3.0f)),
      (11L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val rows = AnnOps.mipsTopK(e)
      .collect().map(r => (r.getLong(1), r.getLong(4)))
    assert(rows.toSeq == Seq((10L, 1L), (11L, 2L)),
      s"MIPS order: ${rows.toSeq}")
  }

  test("M-augmentation: cosine order on augmented = dot order") {
    // Planted exact vectors; M = max norm. After augmentation all
    // corpus norms equal M, so cos = ip/(M·|q|) — order-preserving.
    val q = Array(2.0, 1.0)
    val corpus = Seq(
      1L -> Array(3.0, 4.0), // |x| = 5, ip = 10
      2L -> Array(6.0, 0.0), // |x| = 6, ip = 12
      3L -> Array(0.0, 2.0), // |x| = 2, ip = 2
      4L -> Array(4.0, 3.0)) // |x| = 5, ip = 11
    val m = corpus.map { case (_, x) =>
      math.sqrt(x.map(v => v * v).sum) }.max
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val byIp = corpus.sortBy { case (id, x) => (-dot(q, x), id) }.map(_._1)
    val byAugCos = corpus.sortBy { case (id, x) =>
      val aug = x :+ math.sqrt(m * m - dot(x, x))
      val qa = q :+ 0.0
      val cos = dot(aug, qa) /
        (math.sqrt(dot(aug, aug)) * math.sqrt(dot(qa, qa)))
      (-cos, id)
    }.map(_._1)
    assert(byIp == byAugCos, s"$byIp vs $byAugCos")
    assert(byIp == Seq(2L, 4L, 1L, 3L), "hand order by inner product")
  }
}
