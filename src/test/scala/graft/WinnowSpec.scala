package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_winnow against an independent pure-Scala winnowing reference
  * (java MessageDigest md5, explicit sliding windows) — brute-force
  * cross-check on real testdata plus the winnowing guarantee on
  * planted strings.
  */
class WinnowSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = 5
  private val W = 8

  /** Portable.md5Hash60 reimplemented from scratch. */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Reference winnow: distinct window-minimum hashes. */
  private def winnow(text: String): Set[Long] = {
    val t = text.toLowerCase
    val hs = (0 to t.length - K).map(i => hash60(t.substring(i, i + K)))
    if (hs.length >= W) hs.sliding(W).map(_.min).toSet else Set(hs.min)
  }

  test("summary columns match the reference on real testdata") {
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = SparkEntry.queries("q_winnow")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (nFps, mn, mx, sum)) =>
      val fps = winnow(docs(id))
      assert(fps.size == nFps, s"doc $id n_fps")
      assert(fps.min == mn && fps.max == mx, s"doc $id extremes")
      assert(fps.toSeq.map(_ % 1000000007L).sum == sum, s"doc $id checksum")
    }
  }

  test("guarantee: docs sharing >= W+K-1 chars share a fingerprint") {
    val shared = "the quick brown fox jumps" // 25 chars >= 12
    val a = winnow("zzz unrelated prefix " + shared + " tail one")
    val b = winnow("completely other start " + shared + " and more")
    val c = winnow("nothing in common with either document here at all")
    assert(a.intersect(b).nonEmpty, "shared substring must share a fingerprint")
    assert(a.intersect(c).isEmpty || a.intersect(c).size < a.intersect(b).size)
  }
}
