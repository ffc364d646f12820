package graft

import graft.plans.OverlapJoinBlocking
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The OverlapJoinBlocking optimizer rule: a declarative
  * `JOIN ON size(array_intersect(a, b)) >= T` must plan as the
  * prefix-filtered token equi-join (no nested loop), return exactly
  * the brute-force pairs, and out-of-scope shapes must pass through
  * untouched.
  */
class OverlapRuleSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    OverlapJoinBlocking.register(s)
    s
  }

  // split()-produced arrays are the rule's target shape (null-free
  // elements — the containsNull=false scope guard).
  private val ls = Seq((1L, "a b c d"), (2L, "b c d e"), (3L, "x y"),
    (4L, "a b c d"), (5L, "a a b c d"))
  private val rs = Seq((10L, "a b c"), (11L, "c d e f"), (12L, "x y z"),
    (13L, "a b c"))

  private def df(xs: Seq[(Long, String)], id: String, arr: String): DataFrame = {
    import spark.implicits._
    xs.toDF(id, "s").select(col(id), split(col("s"), " ").as(arr))
  }

  private def brute(t: Int): Seq[(Long, Long)] =
    (for ((li, la) <- ls; (ri, ra) <- rs
      if la.split(" ").toSet.intersect(ra.split(" ").toSet).size >= t)
      yield (li, ri)).sorted

  test("declarative overlap>=3 join: no nested loop, equals brute force") {
    val joined = df(ls, "lid", "la").join(df(rs, "rid", "ra"),
      size(array_intersect(col("la"), col("ra"))) >= lit(3))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"rule did not fire, plan:\n$p")
    assert(p.contains("array_intersect"), s"verify filter missing, plan:\n$p")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    // brute uses SET intersection, so row 5's duplicated "a" token
    // must not double-count — covered by the equality itself.
    assert(got == brute(3), s"got $got want ${brute(3)}")
  }

  test("extra conjuncts ride along as residual predicates") {
    val joined = df(ls, "lid", "la").join(df(rs, "rid", "ra"),
      size(array_intersect(col("la"), col("ra"))) >= lit(3)
        && col("rid") =!= lit(13L))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"plan:\n$p")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(got == brute(3).filterNot(_._2 == 13L))
  }

  test("the strict spelling size(..) > 2 blocks at T=3 too") {
    val joined = df(ls, "lid", "la").join(df(rs, "rid", "ra"),
      size(array_intersect(col("la"), col("ra"))) > lit(2))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"plan:\n$p")
    assert(joined.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
      == brute(3))
  }

  test("outer joins and degenerate thresholds stay un-rewritten") {
    val outer = df(ls, "lid", "la").join(df(rs, "rid", "ra"),
      size(array_intersect(col("la"), col("ra"))) >= lit(3), "left")
    val po = outer.queryExecution.executedPlan.toString
    assert(po.contains("NestedLoop") || po.contains("CartesianProduct"),
      s"outer join must pass through, plan:\n$po")
    val t0 = df(ls, "lid", "la").join(df(rs, "rid", "ra"),
      size(array_intersect(col("la"), col("ra"))) >= lit(0))
    val p0 = t0.queryExecution.executedPlan.toString
    assert(p0.contains("NestedLoop") || p0.contains("CartesianProduct"),
      s"T=0 is vacuous and must pass through, plan:\n$p0")
    assert(t0.count() == ls.size.toLong * rs.size)
  }

  test("joins that already have an equi key are left alone (re-blocking guard)") {
    import spark.implicits._
    val l = Seq((1L, "a b c", "k")).toDF("lid", "s", "ka")
      .select(col("lid"), split(col("s"), " ").as("la"), col("ka"))
    val r = Seq((10L, "a b c", "k")).toDF("rid", "s", "kb")
      .select(col("rid"), split(col("s"), " ").as("ra"), col("kb"))
    val joined = l.join(r,
      col("ka") === col("kb")
        && size(array_intersect(col("la"), col("ra"))) >= lit(3))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Generate explode"),
      s"rule re-blocked an equi-key join, plan:\n$p")
    assert(joined.count() == 1)
  }

  test("rows with fewer than T distinct tokens drop via the empty prefix") {
    // (3L, "x y") has 2 < 3 distinct tokens: it can never qualify and
    // the Generate must drop it map-side — already covered by brute
    // equality, pinned here explicitly.
    val joined = df(ls, "lid", "la").join(df(rs, "rid", "ra"),
      size(array_intersect(col("la"), col("ra"))) >= lit(3))
    assert(!joined.collect().exists(_.getLong(0) == 3L))
  }
}
