package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** TextOps.trainBpe against an independent pure-Scala BPE reference
  * (explicit symbol lists + left-to-right non-overlapping merge), so
  * the padded-string replace trick is cross-checked by an
  * implementation that shares none of its machinery — the SubstrSaSpec
  * brute-force pattern applied to tokenizer training.
  */
class BpeTrainSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Reference BPE: Sennrich et al.'s learn_bpe over an explicit
    * symbol-list vocab. Merge application is the sequential
    * left-to-right non-overlapping scan. */
  private def refBpe(words: Map[String, Long], k: Int)
      : Seq[(String, String, Long)] = {
    def mergeOnce(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    var vocab = words.toList.map { case (w, n) => (w.map(_.toString).toList, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var dry = false
    for (_ <- 1 to k if !dry) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; p <- syms.sliding(2) if p.length == 2)
        counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + n
      if (counts.isEmpty) dry = true
      else {
        val ((pa, pb), np) =
          counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((pa, pb, np))
        vocab = vocab.map { case (syms, n) => (mergeOnce(syms, pa, pb), n) }
      }
    }
    merges.toSeq
  }

  test("planted corpus: merge sequence matches the reference exactly") {
    import spark.implicits._
    // Classic BPE demo vocabulary (low/lower/newest/widest family)
    // plus an aaaa word to stress the run-merge semantics.
    val words = Map(
      "low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "aaaa" -> 4L)
    val text = words.toSeq
      .flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val got = TextOps.trainBpe(spark, docs, 8)._1
    val want = refBpe(words, 8)
    assert(got == want, s"got $got\nwant $want")
  }

  test("run semantics: 'a a a a' merges to two 'aa', 'a a a' to 'aa a'") {
    import spark.implicits._
    val docs = Seq((0L, "aaaa aaa")).toDF("doc_id", "text")
    val (merges, vocab) = TextOps.trainBpe(spark, docs, 1)
    assert(merges == Seq(("a", "a", 5L))) // 3 pairs in aaaa + 2 in aaa
    val syms = vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(syms("aaaa") == List("aa", "aa"))
    assert(syms("aaa") == List("aa", "a"))
  }

  test("fully-merging corpus: dry rounds keep the vocab (the oracle's LEFT JOIN twin)") {
    import spark.implicits._
    // 'aa' (×2) and 'bb' fully merge after 2 rounds; rounds 3..8 are
    // dry. The engine early-stops and must keep the final vocabulary;
    // the oracle's v_i CTE takes b_i by LEFT JOIN ON TRUE with
    // coalesce('') replace args precisely so an empty merge round
    // passes v_i through unchanged — the old CROSS JOIN form would
    // have emptied v_i (and q_bpe_encode's whole vocabulary) here.
    // Verified live against DuckDB on this exact corpus: train yields
    // [(1,a,a,2),(2,b,b,1)] and encode keeps aa→[aa], bb→[bb].
    val docs = Seq((0L, "aa bb aa")).toDF("doc_id", "text")
    val (merges, vocab) = TextOps.trainBpe(spark, docs, 8)
    assert(merges == refBpe(Map("aa" -> 2L, "bb" -> 1L), 8))
    assert(merges == Seq(("a", "a", 2L), ("b", "b", 1L)))
    assert(merges.length < 8, "corpus must fully merge before round k")
    val syms = vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(syms == Map("aa" -> List("aa"), "bb" -> List("bb")),
      s"dry rounds must not empty the vocab: $syms")
    // Static pin on the oracle's shape: the dry-round pass-through
    // depends on the LEFT JOIN form staying put.
    for (q <- Seq("q_bpe_train", "q_bpe_encode")) {
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains("LEFT JOIN b"), s"$q oracle lost the LEFT JOIN")
      assert(!sql.contains("CROSS JOIN b"), s"$q oracle regressed to CROSS JOIN")
    }
  }

  test("first merge equals q_bpe_pairs' rank-1 statistic on real data") {
    val sf = "/root/testdata/sf0.001"
    val top = SparkEntry.queries("q_bpe_pairs")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("rank") === 1L)
      .head()
    val first = TextOps
      .trainBpe(spark, Tables.documents(spark, sf), 1)._1.head
    assert(first._1 + first._2 == top.getString(1),
      s"round-1 merge ${first._1}+${first._2} != pairs top-1 ${top.getString(1)}")
    assert(first._3 == top.getLong(2))
  }
}
