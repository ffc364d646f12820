package graft

import graft.operators.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** The RLE8 decoder behind q_image_rle: pinned against a HAND-LAID
  * byte literal covering every published control path — including
  * delta with dy > 0, which the fixture deliberately does not emit —
  * then the fixture roundtrip against the closed form the oracle
  * recomputes, and the batch-seam swap claim (the BmpSwapSpec
  * discipline on the compressed codec).
  */
class RleBmpSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def le32(v: Int): Seq[Int] =
    Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
  private def le16(v: Int): Seq[Int] = Seq(v & 0xff, (v >> 8) & 0xff)

  /** 4×3 RLE8 with an identity-ish palette: pal[i] = (B,G,R) =
    * (i, 2i%256, 3i%256). Control paths, in encoding order (file rows
    * bottom-up — file row 0 is visual y=2):
    *   file row 0: run 2×5, absolute 3×(6,7,8) + pad — BUT absolute
    *               length 3 overruns the 4-wide row by 1: the decoder
    *               must clip writes past x=3 while still consuming
    *               the stream; then EOL.
    *   file row 1: delta (1, 1) — skips one pixel right and ONE ROW UP
    *               (dy > 0): all of file row 1 stays background 0, and
    *               the cursor lands at (1, file row 2).
    *   file row 2 (after the delta): run 2×9, then EOB early — pixel
    *               (3, row 2) stays background.
    * Expected canvas (file coords, x = 0..3):
    *   row 0: 5 5 6 7   (8 clipped)
    *   row 1: 0 0 0 0
    *   row 2: 0 9 9 0
    */
  test("parser against a hand-laid literal: clip, delta dy>0, early EOB") {
    val dataOff = 14 + 40 + 1024
    val body = Seq(
      2, 5, 0, 3, 6, 7, 8, 0, // run 2×5; absolute (6,7,8) + pad
      0, 0,                   // EOL
      0, 2, 1, 1,             // delta (dx=1, dy=1)
      2, 9,                   // run 2×9 at (1, row 2)
      0, 1)                   // EOB
    val header =
      Seq('B'.toInt, 'M'.toInt) ++ le32(dataOff + body.size) ++
        le16(0) ++ le16(0) ++ le32(dataOff) ++
        le32(40) ++ le32(4) ++ le32(3) ++ le16(1) ++ le16(8) ++
        le32(1) ++ le32(body.size) ++
        le32(2835) ++ le32(2835) ++ le32(256) ++ le32(0)
    val palette = (0 until 256).flatMap(i =>
      Seq(i, (2 * i) % 256, (3 * i) % 256, 0))
    val bmp = (header ++ palette ++ body).map(_.toByte).toArray
    assert(bmp.length == dataOff + body.size)

    val st = MultimodalOps.RleDecoder.decodeOne(7L, bmp)
    assert(st.width == 4 && st.height == 3 && st.n_pixels == 12)
    val canvasFileOrder = Seq(
      Seq(5, 5, 6, 7),
      Seq(0, 0, 0, 0),
      Seq(0, 9, 9, 0))
    val idxSum = canvasFileOrder.flatten.sum
    assert(st.sum_idx == idxSum)
    assert(st.sum_b == idxSum) // identity palette channel B
    assert(st.sum_g == canvasFileOrder.flatten.map(i => (2 * i) % 256).sum)
    assert(st.sum_r == canvasFileOrder.flatten.map(i => (3 * i) % 256).sum)
    // Visual y: file row 0 is the BOTTOM row (y = 2, weight 3); file
    // row 2 is the top (weight 1) — a row-order misparse flips these.
    assert(st.y_moment ==
      3 * canvasFileOrder(0).sum + 2 * canvasFileOrder(1).sum
        + 1 * canvasFileOrder(2).sum)
  }

  test("fixture roundtrip equals the closed form for every salted asset") {
    val f = MultimodalOps.RleFixture
    (0L until 200L).foreach { d =>
      val st = MultimodalOps.RleDecoder.decodeOne(d, f.encode(d))
      val (w, h) = (f.width(d), f.height(d))
      val px = for (y <- 0 until h; x <- 0 until w) yield f.pix(d, x, y)
      val pxy = for (y <- 0 until h; x <- 0 until w) yield (f.pix(d, x, y), y)
      assert(st.width == w && st.height == h && st.n_pixels == w * h)
      assert(st.sum_idx == px.map(_.toLong).sum, s"doc $d sum_idx")
      assert(st.sum_b == px.map(i => f.palB(d, i).toLong).sum, s"doc $d sum_b")
      assert(st.sum_g == px.map(i => f.palG(d, i).toLong).sum, s"doc $d sum_g")
      assert(st.sum_r == px.map(i => f.palR(d, i).toLong).sum, s"doc $d sum_r")
      assert(st.y_moment == pxy.map { case (i, y) => (y + 1).toLong * i }.sum,
        s"doc $d y_moment")
    }
    // The fixture must actually exercise both absolute paddings (k=3
    // pads, k=4 doesn't — row parity), both row closers (run+EOL vs
    // delta+EOL), and background pixels from delta and early EOB.
    val anyDelta = (0L until 200L).exists(d => f.height(d) >= 2)
    val anyBackground = (0L until 200L).exists { d =>
      (0 until f.height(d)).exists(y =>
        (0 until f.width(d)).exists(x => f.pix(d, x, y) == 0 && (y % 2 == 1 || y == 0)))
    }
    assert(anyDelta && anyBackground)
  }

  test("swap claim: batch membership identical under stub and RLE decoder") {
    val sc = spark.sparkContext
    val payloads = sc.parallelize(
      (0L until 200L).map(d => (d, MultimodalOps.RleFixture.encode(d))), 13)
    val viaStub = MultimodalOps
      .decodedBatches(payloads, (b: Seq[(Long, Array[Byte])]) => b.map(_._1))
      .map { case (part, bi, id) => (id, part, bi) }.collect().toSet
    val viaReal = MultimodalOps
      .decodedBatches(payloads, MultimodalOps.RleDecoder.decodeBatch)
      .map { case (part, bi, st) => (st.doc_id, part, bi) }.collect().toSet
    assert(viaStub == viaReal,
      "placement/order/batching must not depend on the decoder")
  }
}
