package graft

import graft.operators.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** The audio half of the real-decoder contract (q_audio_decode): the
  * RIFF parser pinned against a HAND-LAID byte literal — including an
  * unknown chunk before data, so naive offset-44 parsing cannot pass
  * — and the fixture roundtrip against the closed form the oracle
  * recomputes, for every salted asset.
  */
class WavDecodeSpec extends AnyFunSuite {

  test("parser against a hand-laid stereo WAV literal with a skip chunk") {
    def le32(v: Int): Seq[Int] =
      Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def le16(v: Int): Seq[Int] = Seq(v & 0xff, (v >> 8) & 0xff)
    def ascii(s: String): Seq[Int] = s.getBytes("US-ASCII").map(_.toInt).toSeq
    // 2 frames, stereo PCM16: frame 0 = (100, -200), frame 1 =
    // (12345, 7). A "junk" chunk of ODD size 3 sits before data, so
    // the walker must apply the RIFF pad rule to land on "data".
    val samples = le16(100) ++ le16(-200 & 0xffff) ++
      le16(12345) ++ le16(7)
    val riff =
      ascii("WAVE") ++
        ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
        le32(8000 * 4) ++ le16(4) ++ le16(16) ++
        ascii("junk") ++ le32(3) ++ Seq(1, 2, 3, 0) ++ // odd size + pad
        ascii("data") ++ le32(8) ++ samples
    val bytes = (ascii("RIFF") ++ le32(riff.length) ++ riff)
      .map(_.toByte).toArray
    val st = MultimodalOps.WavDecoder.decodeOne(7L, bytes)
    assert(st.n_channels == 2 && st.n_frames == 2 && st.sample_rate == 8000)
    assert(st.sum_ch0 == 100 + 12345)
    assert(st.sum_ch1 == -200 + 7)
    assert(st.abs_sum_ch0 == 100 + 12345)
    assert(st.moment == 1 * 100 + 2 * 12345)
    assert(st.burst_start == 1, "|12345| > 10000 first at frame 1")
  }

  test("fixture roundtrip equals the closed form for every salted asset") {
    (0L until 200L).foreach { d =>
      val f = MultimodalOps.WavFixture
      val st = MultimodalOps.WavDecoder.decodeOne(d, f.encode(d))
      val n = f.frames(d)
      val nc = f.channels(d)
      assert(st.n_channels == nc && st.n_frames == n && st.sample_rate == 8000)
      assert(st.sum_ch0 == (0 until n).map(i => f.sample(d, i, 0).toLong).sum)
      assert(st.sum_ch1 ==
        (if (nc == 2) (0 until n).map(i => f.sample(d, i, 1).toLong).sum
         else 0L))
      assert(st.abs_sum_ch0 ==
        (0 until n).map(i => math.abs(f.sample(d, i, 0)).toLong).sum)
      assert(st.moment ==
        (0 until n).map(i => (i + 1).toLong * f.sample(d, i, 0)).sum)
      assert(st.burst_start == f.burstStart(d),
        s"doc $d: planted burst ${f.burstStart(d)} recovered as ${st.burst_start}")
    }
    // The fixture must actually exercise the chunk walk: odd doc_ids
    // carry a LIST chunk, so data is NOT at offset 44 for them.
    val withList = MultimodalOps.WavFixture.encode(1L)
    assert(new String(withList, 36, 4, "US-ASCII") == "LIST",
      "odd assets must carry the skip chunk")
  }
}
