package graft

import graft.functions.Gpt2Bytes
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** GPT-2's bytes-to-unicode map behind q_bpe_bytes: the published
  * identities (printable bytes fixed; space → 'Ġ'; "é" → "Ã©"),
  * bijectivity over the full byte alphabet, the closed form the
  * oracle recomputes, and the end-to-end fertility contract on a
  * corpus with planted non-ASCII.
  */
class BpeBytesSpec extends AnyFunSuite {

  private def m(s: String): String =
    Gpt2Bytes.map(UTF8String.fromString(s)).toString

  test("published identities: printables fixed, space is Ġ, é is Ã©") {
    assert(m("hello!") == "hello!")
    assert(m(" ") == "Ġ") // Ġ = 256 + 32, THE GPT-2 artifact
    assert(m("é") == "Ã©")     // UTF-8 C3 A9: both printable already
    assert(m("ß") == "Ã" + 321.toChar) // C3 9F; 9F → 256+33+32 = 321
    assert(m("") == "")
  }

  test("the table is a bijection matching the oracle's closed form") {
    assert(Gpt2Bytes.Table.toSet.size == 256, "map must be injective")
    def closedForm(b: Int): Int =
      if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172)
        || (b >= 174 && b <= 255)) b
      else if (b < 33) 256 + b
      else if (b <= 160) 289 + (b - 127)
      else 323
    for (b <- 0 until 256)
      assert(Gpt2Bytes.Table(b).toInt == closedForm(b),
        s"byte $b: table ${Gpt2Bytes.Table(b).toInt} vs oracle ${closedForm(b)}")
  }

  test("multi-byte inputs expand one symbol per UTF-8 byte") {
    // 'ß' is U+00DF = bytes C3 9F: C3 printable (Ã), 9F=159 unprintable
    // → 256 + 33 + (159 − 127) = 321.
    val out = m("aß")
    assert(out.length == 3)
    assert(out(0) == 'a' && out(1) == 'Ã' && out(2).toInt == 321)
    // A 3-byte char (€ U+20AC = E2 82 AC) expands to three symbols —
    // the map is byte-complete even though q_bpe_bytes' oracle only
    // needs the 2-byte arm for its corpus.
    assert(m("€").length == 3)
  }

  test("q_bpe_bytes: byte fertility is at least char fertility on the planted corpus") {
    val rows = SparkEntry.queries("q_bpe_bytes")(
      TestSpark.spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 2)
    val byMode = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (cw, co, cs, cf) = byMode("char")
    val (bw, bo, bs, bf) = byMode("byte")
    // Same words, same occurrence counts (the pre-map is injective).
    assert(cw == bw && co == bo)
    // The accented words cost the byte face extra symbols; merges can
    // narrow but not invert the gap on this corpus.
    assert(bs >= cs, s"byte symbols $bs < char symbols $cs")
    assert(bf >= cf, s"byte fertility $bf < char fertility $cf")
    assert(cf >= 1.0 && bf >= 1.0)
  }
}
