package graft

import graft.operators.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** The decoder-swap contract behind q_image_decode: the REAL BMP
  * parser and the digest stub run behind the SAME batch seam
  * (MultimodalOps.decodedBatches — one function value swapped), so
  * this spec pins (1) the parser against a HAND-LAID byte literal (not
  * the fixture encoder — a shared bug can't cancel out), (2) the
  * fixture roundtrip against the closed form the oracle recomputes,
  * including real stride padding and the planted-edge uniqueness
  * argument, and (3) the swap claim itself: batch membership —
  * placement, order, batch ids — is identical under both decoders.
  */
class BmpSwapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("parser against a hand-laid 2x2 BMP literal (stride pad, bottom-up, BGR)") {
    // 2x2, 24bpp: stride = ((6+3)/4)*4 = 8, two pad bytes per row.
    // Pixels chosen asymmetric in every axis:
    //   top row    (y=0): (B,G,R) = (1,2,3)   (4,5,6)
    //   bottom row (y=1): (B,G,R) = (7,8,9)   (10,11,200)
    // Stored bottom-up: the y=1 row comes FIRST in the file.
    def le32(v: Int): Seq[Int] = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def le16(v: Int): Seq[Int] = Seq(v & 0xff, (v >> 8) & 0xff)
    val header =
      Seq('B'.toInt, 'M'.toInt) ++ le32(54 + 16) ++ le16(0) ++ le16(0) ++
        le32(54) ++ le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val rows =
      Seq(7, 8, 9, 10, 11, 200, 0, 0) ++ // y=1 (bottom) + 2 pad bytes
        Seq(1, 2, 3, 4, 5, 6, 0, 0)      // y=0 (top) + 2 pad bytes
    val bmp = (header ++ rows).map(_.toByte).toArray
    assert(bmp.length == 70)

    val st = MultimodalOps.BmpDecoder.decodeOne(42L, bmp)
    assert(st.width == 2 && st.height == 2 && st.n_pixels == 4)
    assert(st.sum_b == 1 + 4 + 7 + 10)
    assert(st.sum_g == 2 + 5 + 8 + 11)
    assert(st.sum_r == 3 + 6 + 9 + 200)
    // y_moment = sum (y+1)*B: top row weight 1, bottom row weight 2 —
    // a top-down misparse would swap the weights (5+34=39 vs 22+17).
    assert(st.y_moment == 1 * (1 + 4) + 2 * (7 + 10))
    // col R sums: x=0 -> 3+9=12, x=1 -> 6+200=206; edge at x=1.
    assert(st.edge_x == 1)
  }

  test("fixture roundtrip equals the closed form for every salted asset") {
    (0L until 200L).foreach { d =>
      val f = MultimodalOps.BmpFixture
      val st = MultimodalOps.BmpDecoder.decodeOne(d, f.encode(d))
      val (w, h) = (f.width(d), f.height(d))
      val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
      assert(st.width == w && st.height == h && st.n_pixels == w * h)
      assert(st.sum_b == px.map { case (x, y) => f.b(d, x, y).toLong }.sum)
      assert(st.sum_g == px.map { case (x, y) => f.g(d, x, y).toLong }.sum)
      assert(st.sum_r == px.map { case (x, y) => f.r(d, x, y).toLong }.sum)
      assert(st.y_moment ==
        px.map { case (x, y) => (y + 1).toLong * f.b(d, x, y) }.sum)
      assert(st.edge_x == f.edge(d),
        s"doc $d: planted edge ${f.edge(d)} recovered as ${st.edge_x}")
    }
    // The fixture must actually exercise stride padding: widths 5/6/7
    // pad (3W = 15/18/21 -> stride 16/20/24), widths 4/8 don't.
    val padded = (0L until 200L).count { d =>
      val w = MultimodalOps.BmpFixture.width(d); (3 * w) % 4 != 0
    }
    assert(padded > 0 && padded < 200, "both padded and unpadded widths present")
  }

  test("swap claim: batch membership is identical under stub and real decoder") {
    val sc = spark.sparkContext
    val payloads = sc.parallelize(
      (0L until 200L).map(d => (d, MultimodalOps.BmpFixture.encode(d))), 13)
    // Stub stand-in with a DIFFERENT output type than the real decoder
    // (the seam is generic — the swap is one function value).
    val viaStub = MultimodalOps
      .decodedBatches(payloads, (b: Seq[(Long, Array[Byte])]) => b.map(_._1))
      .map { case (part, bi, id) => (id, part, bi) }.collect().toSet
    val viaReal = MultimodalOps
      .decodedBatches(payloads, MultimodalOps.BmpDecoder.decodeBatch)
      .map { case (part, bi, st) => (st.doc_id, part, bi) }.collect().toSet
    assert(viaStub == viaReal,
      "placement/order/batching must not depend on the decoder")
    // And the placement is the documented one: part = id mod 4,
    // batch_seq = rank-within-partition / 32.
    viaReal.foreach { case (id, part, bi) =>
      assert(part == id % 4)
      assert(bi == ((id / 4) / 32),
        s"doc $id: batch ${bi} != ${(id / 4) / 32}")
    }
  }
}
