package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_kl_domains: identical sources read 0, and a hand-exact
  * two-source split where each source concentrates on its own word.
  */
class KlDomainsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def kl(rows: Seq[(String, String)]): Map[String, Double] = {
    import spark.implicits._
    TextOps.klDomains(rows.toDF("source", "w"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
  }

  test("identical distributions read exactly zero") {
    val rows = Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))
    val got = kl(rows)
    assert(got("a") == 0.0 && got("b") == 0.0)
  }

  test("hand-exact shift: each source owns one word -> KL = 1 bit") {
    // Source a: all 'x'; source b: all 'y'; mixture is 50/50, so
    // KL(a||mix) = 1*log2(1/0.5) = 1 bit each.
    val rows = Seq.fill(8)(("a", "x")) ++ Seq.fill(8)(("b", "y"))
    val got = kl(rows)
    assert(got("a") == 1.0 && got("b") == 1.0, s"$got")
  }
}
