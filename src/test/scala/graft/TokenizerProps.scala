package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the tokenizer contract shared by
  * q_wordcount and its DuckDB oracle (SURVEY.md §7.5: tokenizer parity
  * is the #1 cross-engine drift risk).
  *
  * `Relational`/`MapReduceParity` split with Java regex via Spark's
  * `split(col, pat, -1)`; the reference (`wc_map.sh`) emits one token
  * per separator-delimited segment INCLUDING empties. We check the JVM
  * regex split used by Spark against a character-level reference
  * implementation on arbitrary strings.
  */
object TokenizerProps extends Properties("tokenizer") {

  /** Exactly what wc_map.sh computes per line (before lowercasing). */
  private def referenceSplit(s: String): List[String] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    s.foreach {
      case c if c == ' ' || c == '\t' => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }

  /** Spark's split(col, "[ \t]", -1) delegates to Java regex split with
    * limit -1 — the exact call Catalyst's StringSplit makes. */
  private def sparkSplit(s: String): List[String] =
    java.util.regex.Pattern.compile("[ \t]").split(s, -1).toList

  private val genText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.const('\t'),
      1 -> Gen.oneOf('.', ',', '\'', 'É', 'ß', '中'),
    )).map(_.mkString)

  property("regex split == reference char-level split, empties kept") =
    Prop.forAll(genText) { s => sparkSplit(s) == referenceSplit(s) }

  property("token concatenation with separators restores the line length") =
    Prop.forAll(genText) { s =>
      val toks = sparkSplit(s)
      toks.map(_.length).sum + (toks.length - 1) == s.length
    }

  property("lowercase distributes over split") =
    Prop.forAll(genText) { s =>
      sparkSplit(s.toLowerCase) == sparkSplit(s).map(_.toLowerCase)
    }
}
