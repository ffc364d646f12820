package graft

import graft.functions.RollHash
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the rolling gram hash: the O(1)-per-char
  * rolling update must equal the direct per-gram polynomial (what the
  * DuckDB oracle evaluates) on ARBITRARY unicode text and window
  * sizes — the cross-engine contract behind q_cdc_chunks.
  */
object RollHashProps extends Properties("rollhash") {

  /** Direct polynomial over code points — an independent spelling of
    * the oracle's per-gram sum (single mod at the end; exact because
    * BigInt). */
  private def direct(cps: Array[Int], k: Int): Seq[Long] =
    (0 to cps.length - k).map { i =>
      (0 until k).foldLeft(BigInt(0)) { (acc, j) =>
        acc + BigInt(cps(i + j)) * BigInt(RollHash.B).pow(k - 1 - j)
      }.mod(BigInt(RollHash.M)).toLong
    }

  private def rolled(s: String, k: Int): Seq[Long] =
    RollHash.compute(UTF8String.fromString(s), k).toLongArray.toSeq

  private val genText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('É', 'ß', '中', '日', 'é'),
    )).map(_.mkString)

  private val genAstral: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", " ", "😀", "🎉", "中")).map(_.mkString)

  private val genK: Gen[Int] = Gen.choose(1, 9)

  property("rolling == direct polynomial on mixed text") =
    Prop.forAll(genText, genK) { (s, k) =>
      val cps = s.codePoints.toArray
      rolled(s, k) == direct(cps, k)
    }

  property("rolling == direct polynomial on astral (surrogate-pair) text") =
    Prop.forAll(genAstral, genK) { (s, k) =>
      val cps = s.codePoints.toArray
      rolled(s, k) == direct(cps, k)
    }

  property("short strings and k<1 yield the empty array") =
    Prop.forAll(Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.alphaChar).map(_.mkString))) { s =>
      rolled(s, s.codePointCount(0, s.length) + 1).isEmpty &&
        rolled(s, 0).isEmpty
    }

  property("gramHash agrees with compute on every window") =
    Prop.forAll(genText.suchThat(_.codePoints.count() >= 3), Gen.choose(1, 3)) {
      (s, k) =>
        val cps = s.codePoints.toArray
        val grams = (0 to cps.length - k)
          .map(i => new String(cps.slice(i, i + k), 0, k))
        rolled(s, k) == grams.map(RollHash.gramHash)
    }
}
