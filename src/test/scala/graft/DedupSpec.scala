package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Behavioral tests for DedupOps on a planted corpus: A and B are
  * near-duplicates (one token differs), C is unrelated. Queries run
  * through the registry exactly as the driver invokes them, against a
  * temp dir shaped like the driver testdata (documents.parquet).
  */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val docs: IndexedSeq[String] = {
    val common = "the quick brown fox jumps over the lazy dog while rain falls " +
      "on the quiet river bank and the old gray bridge creaks under heavy wind"
    IndexedSeq(
      common + " at dusk",
      common + " at dawn",
      "completely different content about spark shuffles partitions and codegen stages",
      common + " at dusk", // exact duplicate of doc 0
    )
  }

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-dedup").toString
    // docs 0/1: one substitution over a long doc keeps 3-gram Jaccard
    // well above the b=4/r=4 LSH threshold (1/b)^(1/r) ≈ 0.71; a pair
    // at J=0.6 sits below the S-curve knee and is only caught p≈0.43.
    docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", s"src$i", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_dedup_exact clusters byte-identical docs, keeps min doc_id") {
    // corpus ∪ corpus: docs 0 and 3 are identical → one 4-copy cluster.
    val rows = run("q_dedup_exact").collect()
    assert(rows.length == 3) // clusters: {0,3}, {1}, {2}
    val byDoc = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byDoc(0L) == 4) // 2 copies of doc0 + 2 of doc3
    assert(byDoc(1L) == 2)
    assert(!byDoc.contains(3L)) // doc3 deduped into doc0's cluster
  }

  test("q_dedup_near finds the near-dup pair and not the unrelated doc") {
    val pairs = run("q_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ab = pairs.filter(p => Set((p._1, p._2)).subsetOf(Set((0L, 1L), (0L, 3L), (1L, 3L))))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 >= 0.5),
      s"expected near-dup (0,1) with high estimate, got $pairs")
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 1.0),
      s"expected exact pair (0,3) at est 1.0, got $pairs")
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L),
      s"unrelated doc 2 must produce no candidate pair, got $pairs")
    assert(ab.nonEmpty)
  }

  test("q_dedup_simhash: identical docs at hamming 0, unrelated absent") {
    val pairs = run("q_dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.contains((0L, 3L, 0L)), s"exact pair must be hamming 0: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"unrelated doc 2 must not appear: $pairs")
  }

  test("q_ngram_jaccard: near-dup pair above threshold with exact value") {
    val pairs = run("q_ngram_jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // Expected value from a char-level reference implementation of
    // distinct 3-gram shingle Jaccard over the planted docs.
    def shingles(text: String): Set[String] =
      text.split(" ", -1).sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (shingles(docs(0)), shingles(docs(1)))
    val expected = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(pairs.contains((0L, 1L)))
    assert(math.abs(pairs((0L, 1L)) - expected) < 1e-9)
    assert(pairs((0L, 3L)) == 1.0)
    assert(!pairs.keys.exists(k => k._1 == 2L || k._2 == 2L))
  }

  test("q_dedup_rescored: exact Jaccard on LSH candidates, estimates discarded") {
    val rows = run("q_dedup_rescored").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def shingles(text: String): Set[String] =
      text.split(" ", -1).sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (shingles(docs(0)), shingles(docs(1)))
    val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
    // The near-dup pair carries its EXACT Jaccard (not the k/16
    // estimate) rounded to the query's 6dp contract, the identical
    // pair scores 1.0, the unrelated doc never becomes a candidate.
    assert(rows((0L, 1L)) ==
      BigDecimal(exact).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rows((0L, 3L)) == 1.0)
    assert(!rows.keys.exists(k => k._1 == 2L || k._2 == 2L))
  }

  test("q_substr_dup: exact duplicate saturates, near-dup pair overlaps, unique doc is clean") {
    val rows = run("q_substr_dup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // docs 0 and 3 are byte-identical → every 20-gram duplicated.
    assert(rows(0L)._2 == 1.0 && rows(3L)._2 == 1.0)
    // docs 0/1 share a long prefix → doc 1 heavily but not fully dup'd
    // (its " at dawn" tail is unique).
    assert(rows(1L)._2 > 0.8 && rows(1L)._2 < 1.0)
    // doc 2 shares no 20-char span with anything.
    assert(rows(2L)._2 == 0.0)
    // n_grams = len - 19 for every doc.
    docs.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i.toLong)._1 == t.length - 19L)
    }
  }

  test("stop-shingle df pruning collapses the candidate join fan-out") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Files.createTempDirectory("graft-stopsh").toString
    // 20 docs share one stop-shingle ("common stop shingle", df=20);
    // every other shingle is unique to its doc (df=1).
    (0 until 20).map { i =>
      val t = s"common stop shingle u$i v$i w$i x$i"
      (i.toLong, t, "en", "s", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val docsDf = spark.read.parquet(s"$d/documents.parquet")
    def candidatePairs(maxDf: Long): Long = {
      val j = operators.DedupOps.prunedShingles(docsDf, maxDf)
        .filter(col("df") >= 2)
      j.as("a").join(j.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id")).count()
    }
    // Unpruned: the stop-shingle alone generates C(20,2) pairs. A df
    // cap below 20 removes it and the candidate set collapses to zero.
    assert(candidatePairs(maxDf = 1000L) == 190L)
    assert(candidatePairs(maxDf = 10L) == 0L)
  }

  test("q_dedup_incremental drops base dups and within-batch dups") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-dedup-incr").toString
    // Base: ids 0,1 (< 400). Batch (≥ 400): 400 duplicates base doc 0
    // (dropped vs base), 401/402 are identical fresh docs (one
    // survives), 403 is unique.
    Seq(
      (0L, "base doc alpha", "en"), (1L, "base doc beta", "en"),
      (400L, "base doc alpha", "en"),
      (401L, "fresh doc gamma", "en"), (402L, "fresh doc gamma", "en"),
      (403L, "fresh doc delta", "fr"),
    ).map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q_dedup_incremental")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("en" -> 1L, "fr" -> 1L)) // gamma (401) + delta (403)
  }
}
