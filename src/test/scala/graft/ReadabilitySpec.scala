package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Hand-counted pins for q_readability: planted prose with known
  * word, sentence, and vowel-group syllable counts hits the Flesch
  * formula exactly; unpunctuated text floors at one sentence.
  */
class ReadabilitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("planted prose hits the hand-computed Flesch score") {
    import spark.implicits._
    // "the cat sat." — 3 words, 1 sentence, 3 syllables:
    // 206.835 − 1.015·3 − 84.6·1 = 119.19.
    // "beautiful prose is readable! truly?" — 5 words, 2 sentences,
    // syllables 3+2+1+3+2 = 11: 206.835 − 1.015·2.5 − 84.6·2.2
    // = 18.1775.
    val docs = Seq(
      ("a", "the cat sat."),
      ("b", "beautiful prose is readable! truly?")).toDF("lang", "text")
    val got = TextOps.readability(docs).collect()
    assert(got(0).getString(0) == "a" && got(0).getDouble(4) == 119.19)
    assert(got(0).getDouble(2) == 3.0 && got(0).getDouble(3) == 1.0)
    assert(got(1).getString(0) == "b" && got(1).getDouble(4) == 18.1775)
    assert(got(1).getDouble(2) == 2.5 && got(1).getDouble(3) == 2.2)
  }

  test("unpunctuated text floors at one sentence; empty words drop") {
    import spark.implicits._
    val docs = Seq(("x", "no  punctuation here")).toDF("lang", "text")
    val got = TextOps.readability(docs).collect()(0)
    // Double space yields an empty token the filter drops: 3 words,
    // 1 floored sentence, syllables 1 + 3 (u, ua, io) + 2 = 6.
    assert(got.getDouble(2) == 3.0, s"wps ${got.getDouble(2)}")
    assert(got.getDouble(3) == 2.0, s"spw ${got.getDouble(3)}")
  }
}
