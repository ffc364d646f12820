package graft

import graft.operators.AnnOps
import org.scalatest.funsuite.AnyFunSuite

/** Planted-pair contract for the cross-corpus embedding
  * decontamination core: a test vector that is a near-copy
  * (paraphrase) of a train vector must be flagged with its cosine;
  * an unrelated test vector must come back clean with a null
  * max_cos; and the same-cell restriction must actually route — the
  * paraphrase pair shares a cell, the unrelated vector sits in the
  * other cell.
  */
class EmbedDecontamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val dim = 64

  /** Unit-ish vector concentrated on axis `axis` with a small
    * `wobble` on the next axis — two vectors on the same axis with
    * different wobbles model a paraphrase pair (cosine ≈ 1), while
    * different axes are orthogonal (cosine ≈ 0). */
  private def vec(axis: Int, wobble: Float): Array[Float] = {
    val a = Array.fill(dim)(0.0f)
    a(axis) = 1.0f
    a((axis + 1) % dim) = wobble
    a
  }

  test("planted paraphrase is flagged; unrelated test doc is clean with null max_cos") {
    import spark.implicits._
    // Two cells: centroid 0 on axis 0, centroid 1 on axis 20.
    val cents = Seq((0L, vec(0, 0.0f)), (1L, vec(20, 0.0f)))
      .toDF("cent_id", "ce")
    // Train: the "original" document near axis 0, plus an axis-20
    // document that will SHARE a cell with the clean test doc while
    // staying far below the similarity threshold — so "clean" is
    // proven against a real same-cell comparison, not an empty cell.
    val train = Seq(
      (1000L, vec(0, 0.05f)),   // original of the paraphrase
      (1001L, vec(20, 0.9f))).toDF("vec_id", "embedding")
    // Test: a paraphrase of train 1000 (same axis, slightly different
    // wobble -> cosine ~0.999) and an unrelated doc near axis 20 but
    // angled far enough from train 1001 to stay below 0.45.
    val test = Seq(
      (1L, vec(0, 0.08f)),
      (2L, { val a = Array.fill(dim)(0.0f); a(20) = 0.2f; a(45) = 1.0f; a }))
      .toDF("vec_id", "embedding")
    val out = AnnOps.embedDecontaminate(spark, test, train, cents, 0.45)
      .orderBy("vec_id").collect()
    assert(out.length == 2)
    val para = out(0)
    assert(para.getLong(0) == 1L)
    assert(para.getLong(1) == 0L, "paraphrase must route to the axis-0 cell")
    assert(para.getLong(4) == 1L, "planted paraphrase not flagged")
    assert(para.getLong(2) >= 1L)
    assert(para.getDouble(3) > 0.99, s"paraphrase cosine was ${para.getDouble(3)}")
    val clean = out(1)
    assert(clean.getLong(0) == 2L)
    assert(clean.getLong(4) == 0L, "clean test doc wrongly flagged")
    assert(clean.getLong(2) == 0L)
    assert(clean.isNullAt(3), "clean doc must report null max_cos")
  }

  test("nprobe=2 catches a boundary-straddling paraphrase that nprobe=1 misses") {
    import spark.implicits._
    // Two centroids: c0 on axis 0, c1 between axes 0 and 20. The
    // train original sits clearly in c0's cell; the paraphrase is
    // nudged toward c1 just enough that its PRIMARY cell is c1 while
    // the original's cell is only its second-nearest — the classic
    // cell-boundary miss.
    def v(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(dim)(0.0f); pairs.foreach { case (i, x) => a(i) = x }; a
    }
    val cents = Seq(
      (0L, v(0 -> 1.0f)),
      (1L, v(0 -> 0.7f, 20 -> 0.7f))).toDF("cent_id", "ce")
    val train = Seq((100L, v(0 -> 1.0f, 20 -> 0.28f))).toDF("vec_id", "embedding")
    val test = Seq((1L, v(0 -> 0.9f, 20 -> 0.45f))).toDF("vec_id", "embedding")
    val single = AnnOps.embedDecontaminate(spark, test, train, cents, 0.45, nprobe = 1)
      .collect().head
    assert(single.getLong(1) == 1L, "planted paraphrase must route primarily to c1")
    assert(single.getLong(4) == 0L,
      "nprobe=1 unexpectedly caught the straddler — the plant no longer straddles")
    val multi = AnnOps.embedDecontaminate(spark, test, train, cents, 0.45, nprobe = 2)
      .collect().head
    assert(multi.getLong(1) == 1L, "reported cell must stay the primary cell")
    assert(multi.getLong(4) == 1L, "nprobe=2 must catch the boundary-straddling paraphrase")
    assert(multi.getDouble(3) > 0.9)
  }

  test("threshold is exact: a pair at cosine just under t stays clean") {
    import spark.implicits._
    val cents = Seq((0L, vec(0, 0.0f))).toDF("cent_id", "ce")
    // cos between axis-0 and a 45-degree-ish vector: 1/sqrt(1+4) ~ 0.447
    // just under 0.45 -> clean; at wobble 2.0 exactly: 1/sqrt(5)=0.447214.
    val train = Seq((10L, vec(0, 0.0f))).toDF("vec_id", "embedding")
    val test = Seq((1L, vec(0, 2.0f))).toDF("vec_id", "embedding")
    val out = AnnOps.embedDecontaminate(spark, test, train, cents, 0.45)
      .collect()
    assert(out.head.getLong(4) == 0L)
    val flagged = AnnOps.embedDecontaminate(spark, test, train, cents, 0.44)
      .collect()
    assert(flagged.head.getLong(4) == 1L)
  }
}
