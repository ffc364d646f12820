package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_jaccard_incremental's contract: probing the persisted base
  * prefix index with a batch must produce EXACTLY the pairs a full
  * PPJoin recompute finds among batch-touching pairs — including
  * boundary-exact pairs sitting at the α₂ positional bound, and
  * batch-batch pairs (the self-join face). The corpus plants all
  * three pair classes plus near-misses.
  */
class JaccardIncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  //  Base ids < 100, batch ids >= 100 (the incremental id discipline).
  //  sh14: 15-token near-dups at J = 14/16 = 0.875 exactly, first
  //  shared token at prefix position 1 on both sides — the
  //  boundary-exact class any α/α₂ off-by-one deletes.
  private val sh14 = ('c' to 'p').map(_.toString).mkString(" ")
  private val corpus: Seq[(Long, String)] = Seq(
    (1L, s"a $sh14"),            // base half of a base-batch pair
    (2L, "q r s t u v w x"),     // base, J = 7/9 near-miss vs 101
    (3L, "m n o p"),             // base noise
    (4L, s"a $sh14"),            // base-base dup of 1 — must NOT appear
    (100L, s"b $sh14"),          // batch: pairs with 1 AND 4 at 0.875
    (101L, "q r s t u v w y"),   // batch: J(2,101) = 7/9 < 0.875
    (102L, s"b $sh14"),          // batch-batch identical to 100 (J=1)
    (103L, "z1 z2 z3"))          // batch noise

  private def toksDf: DataFrame = {
    import spark.implicits._
    corpus.toDF("doc_id", "text").select(col("doc_id"),
      array_distinct(expr("filter(split(lower(text), ' '), x -> x <> '')"))
        .as("toks"))
  }

  /** Full-recompute brute force (exact rational, t = 7/8) restricted
    * to batch-touching pairs, rolled up the query's way. */
  private def fullRestricted: Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (i, t) =>
      (i, t.toLowerCase.split(" ").filter(_.nonEmpty).toSet)
    }
    val pairs = for {
      (ia, ta) <- toks; (ib, tb) <- toks
      if ia < ib && ib >= 100L
      ns = ta.intersect(tb).size.toLong
      nu = ta.union(tb).size.toLong
      if ns * 8 >= nu * 7
    } yield (ns, nu, ia + ib)
    pairs.groupBy(p => (p._1, p._2)).toSeq
      .map { case ((ns, nu), xs) =>
        (ns, nu, xs.size.toLong, xs.map(_._3).sum) }
      .sortBy(x => (x._1, x._2))
  }

  test("batch+base equals the full recompute on batch-touching pairs") {
    val toks = toksDf
    val got = DedupOps.jaccardIncremental(spark,
        toks.filter(col("doc_id") < 100), toks.filter(col("doc_id") >= 100),
        toks)
      .collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2),
        r.getLong(3)))
      .toSeq
    assert(got == fullRestricted, s"got $got want $fullRestricted")
    // The corpus must actually exercise all three classes: the
    // boundary 0.875 base-batch pairs, a batch-batch pair, and a
    // near-miss that must stay out.
    val want = fullRestricted
    assert(want.exists { case (ns, nu, _, _) => ns * 8 == nu * 7 },
      "boundary-exact pair missing from the fixture")
    assert(want.map(_._3).sum >= 3, "expected >= 3 qualifying pairs")
    assert(!want.exists { case (ns, nu, _, _) => ns == 7 && nu == 9 },
      "the 7/9 near-miss must not qualify")
  }

  test("base-base pairs never surface (1,4 are dups but both in base)") {
    val toks = toksDf
    val got = DedupOps.jaccardIncremental(spark,
        toks.filter(col("doc_id") < 100), toks.filter(col("doc_id") >= 100),
        toks)
      .agg(sum(col("id_checksum"))).collect()(0).getLong(0)
    // Checksum of the full-restricted set; the (1,4) base pair would
    // add 5 if it leaked through.
    assert(got == fullRestricted.map(_._4).sum)
  }
}
