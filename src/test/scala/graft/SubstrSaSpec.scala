package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Behavioral tests for q_substr_sa (truncated-suffix-array exact
  * duplicated-character coverage) on a planted corpus, plus the
  * finds-at-least-the-proxy relation vs q_substr_dup on real testdata
  * that the SURVEY §8 row claims.
  *
  * Planted layout: docs 0 and 1 share one 40-char span (cross-doc
  * duplication → 21 overlapping duplicated 20-grams that must union to
  * exactly 40 covered chars, not 21×20); doc 2 is all-unique; doc 3
  * repeats one 20-char block twice within itself (within-doc
  * duplication → two disjoint 20-char islands).
  */
class SubstrSaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // 40 distinct characters: every 20-gram inside is unique within the
  // span, so duplication comes only from the span appearing twice.
  private val shared40 = "0123456789abcdefghijklmnopqrstuvwxyzABCD"
  private val block20 = "EFGHIJKLMNOPQRSTUVWX"

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-substr-sa").toString
    val docs = Seq(
      (0L, shared40 + " with a unique tail zero!!"),
      (1L, "unique head one?? " + shared40),
      (2L, "no duplicated twenty-gram anywhere in this document"),
      (3L, block20 + " some middle filler " + block20),
      // byte-identical pair on a disjoint charset: fully covered
      (4L, "@#$%^&*()_+=~`[]{}|;:<>/4567"),
      (5L, "@#$%^&*()_+=~`[]{}|;:<>/4567"),
    )
    docs.map { case (i, t) => (i, t, "en", s"src$i", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String, d: String) =
    SparkEntry.queries(name)(spark, d)

  test("cross-doc shared span: overlapping duplicated grams union to exact char coverage") {
    val rows = run("q_substr_sa", dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(0L)._1 == 40L, s"doc0 expected 40 covered chars, got ${rows(0L)}")
    assert(rows(1L)._1 == 40L, s"doc1 expected 40 covered chars, got ${rows(1L)}")
    assert(rows(2L)._1 == 0L, s"doc2 must have zero coverage, got ${rows(2L)}")
    val len0 = (shared40 + " with a unique tail zero!!").length
    assert(math.abs(rows(0L)._2 - 40.0 / len0) < 1e-6)
  }

  test("within-doc repeat: two exact-match islands, boundary grams excluded") {
    val rows = run("q_substr_sa", dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Only the two exact 20-char occurrences duplicate; grams crossing
    // into the filler occur once and must not extend the islands.
    assert(rows(3L) == 40L, s"doc3 expected 2×20 covered chars, got ${rows(3L)}")
  }

  test("q_substr_strip removes exactly the measured spans and hashes the cleaned text") {
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = run("q_substr_strip", dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // kept text = planted text minus the shared span, hash-verified.
    assert(rows(0L) == ((26L, 40L, md5(" with a unique tail zero!!"))), s"${rows(0L)}")
    assert(rows(1L) == ((18L, 40L, md5("unique head one?? "))), s"${rows(1L)}")
    // untouched doc round-trips byte-identically
    val t2 = "no duplicated twenty-gram anywhere in this document"
    assert(rows(2L) == ((t2.length.toLong, 0L, md5(t2))), s"${rows(2L)}")
    // within-doc repeat: both occurrences cut, filler survives
    assert(rows(3L) == ((20L, 40L, md5(" some middle filler "))), s"${rows(3L)}")
    // fully duplicated docs empty out (md5 of the empty string)
    assert(rows(4L) == ((0L, 28L, md5(""))), s"${rows(4L)}")
    assert(rows(5L) == ((0L, 28L, md5(""))), s"${rows(5L)}")
  }

  test("strip's removed_chars equals the measure's dup_chars on real testdata") {
    val sf = "/root/testdata/sf0.001"
    val removed = run("q_substr_strip", sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val measured = run("q_substr_sa", sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(removed == measured, "strip and measure must agree span for span")
  }

  test("random small-alphabet corpora match a brute-force coverage reference") {
    import spark.implicits._
    // 3-letter alphabet forces heavy 20-gram collisions within and
    // across docs; the brute-force reference recomputes coverage from
    // first principles (positions of any 20-gram occurring >= 2 times
    // corpus-wide, unioned as intervals).
    val rnd = new scala.util.Random(42)
    val docs = (0L until 12L).map { i =>
      i -> (1 to 60 + rnd.nextInt(60)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val d = Files.createTempDirectory("graft-substr-prop").toString
    docs.map { case (i, t) => (i, t, "en", s"s$i", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    val counts = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach { case (_, t) =>
      (0 to t.length - 20).foreach(p => counts.updateWith(t.substring(p, p + 20))(c => Some(c.getOrElse(0) + 1)))
    }
    val expected = docs.map { case (i, t) =>
      val dupStarts = (0 to t.length - 20).filter(p => counts(t.substring(p, p + 20)) >= 2)
      val covered = dupStarts.flatMap(p => p until p + 20).toSet.size
      i -> covered.toLong
    }.toMap

    val got = SparkEntry.queries("q_substr_sa")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"coverage mismatch:\n got=$got\n exp=$expected")
  }

  test("finds at least the proxy's duplication on real testdata (signal sets agree)") {
    val sf = "/root/testdata/sf0.001"
    val sa = run("q_substr_sa", sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val proxy = run("q_substr_dup", sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sa.keySet == proxy.keySet,
      "both operators must emit one row per length>=20 doc")
    proxy.foreach { case (id, fr) =>
      if (fr > 0)
        assert(sa(id) >= 20L,
          s"doc $id: proxy sees duplication ($fr) but SA coverage is ${sa(id)}")
      else
        assert(sa(id) == 0L,
          s"doc $id: proxy sees none but SA coverage is ${sa(id)}")
    }
  }
}
