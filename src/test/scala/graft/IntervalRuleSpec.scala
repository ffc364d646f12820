package graft

import graft.plans.IntervalOverlapJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IntervalOverlapJoin optimizer rule: a declarative
  * `JOIN ON a.lo <= b.hi AND b.lo <= a.hi` must plan as the binned
  * equi-join (no nested loop), return exactly the brute-force pairs
  * WITH multiplicity (the canonical shared-bucket filter), and
  * out-of-scope shapes must pass through untouched.
  */
class IntervalRuleSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    IntervalOverlapJoin.register(s)
    s
  }

  private val G = IntervalOverlapJoin.BinWidth

  // Spans chosen to cross several 1800-wide buckets (multi-bucket
  // matches exercise the canonical filter), plus touching endpoints,
  // a duplicate row (multiplicity), a negative span, and an inverted
  // interval whose RAW predicate can still hold.
  private val ls: Seq[(String, Double, Double)] = Seq(
    ("L0", 0.0, 4000.0), ("L1", 3600.0, 3600.0), ("L2", 9000.0, 12600.0),
    ("L2", 9000.0, 12600.0), ("L3", -5000.0, -100.0), ("Linv", 7000.0, 5000.0))
  private val rs: Seq[(String, Double, Double)] = Seq(
    ("R0", 3500.0, 10000.0), ("R1", 4000.0, 4000.0), ("R2", 12600.0, 20000.0),
    ("R3", -200.0, 100.0), ("R4", 5500.0, 6500.0))

  private def brute(pred: ((String, Double, Double), (String, Double, Double)) => Boolean)
      : Seq[(String, String)] =
    (for (l <- ls; r <- rs if pred(l, r)) yield (l._1, r._1)).sorted

  test("declarative overlap join: no nested loop, equals brute force with multiplicity") {
    import spark.implicits._
    val l = ls.toDF("la", "lo1", "hi1")
    val r = rs.toDF("rb", "lo2", "hi2")
    val joined = l.join(r,
      col("lo1") <= col("hi2") && col("lo2") <= col("hi1"))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"rule did not fire, plan:\n$p")
    val got = joined.collect().map(x => (x.getString(0), x.getString(3)))
      .sorted.toSeq
    val want = brute { case ((_, lo1, hi1), (_, lo2, hi2)) =>
      lo1 <= hi2 && lo2 <= hi1
    }
    assert(got == want)
    // the duplicated L2 row must double every one of its matches
    assert(got.count(_ == ("L2", "R0")) == 2)
    // multi-bucket overlaps must appear exactly once per row pair
    assert(got.count(_ == ("L0", "R0")) == 1,
      "canonical filter must collapse multi-bucket matches")
    // the inverted-interval row's raw-predicate matches must survive
    assert(want.exists(_._1 == "Linv") == got.exists(_._1 == "Linv"))
  }

  test("strict bounds and residual conjuncts survive the rewrite exactly") {
    import spark.implicits._
    val l = ls.toDF("la", "lo1", "hi1")
    val r = rs.toDF("rb", "lo2", "hi2")
    val joined = l.join(r,
      col("lo1") < col("hi2") && col("lo2") < col("hi1")
        && col("rb") =!= "R4")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"plan:\n$p")
    val got = joined.collect().map(x => (x.getString(0), x.getString(3)))
      .sorted.toSeq
    assert(got == brute { case ((_, lo1, hi1), (b, lo2, hi2)) =>
      lo1 < hi2 && lo2 < hi1 && b != "R4"
    }, "touching endpoints must drop under strict bounds")
  }

  test("nulls drop exactly like the un-rewritten join") {
    import spark.implicits._
    val l = Seq(("a", Some(1.0), Some(5.0)), ("n", None, Some(5.0)))
      .toDF("la", "lo1", "hi1")
    val r = Seq(("b", Some(4.0), Some(9.0)), ("m", Some(4.0), None))
      .toDF("rb", "lo2", "hi2")
    val joined = l.join(r,
      col("lo1") <= col("hi2") && col("lo2") <= col("hi1"))
    assert(joined.collect().map(x => (x.getString(0), x.getString(3)))
      .toSeq == Seq(("a", "b")))
  }

  test("equi-key joins, outer joins, and same-direction pairs pass through") {
    import spark.implicits._
    val l = ls.toDF("la", "lo1", "hi1")
    val r = rs.toDF("rb", "lo2", "hi2")
    val keyed = l.withColumn("k", lit(1))
      .join(r.withColumn("k2", lit(1)),
        col("k") === col("k2")
          && col("lo1") <= col("hi2") && col("lo2") <= col("hi1"))
    assert(!keyed.queryExecution.executedPlan.toString
      .contains("Generate explode"), "equi-key join must not be re-blocked")
    val outer = l.join(r,
      col("lo1") <= col("hi2") && col("lo2") <= col("hi1"), "left")
    val po = outer.queryExecution.executedPlan.toString
    assert(po.contains("NestedLoop") || po.contains("CartesianProduct"),
      s"outer join must pass through, plan:\n$po")
    // two inequalities in the SAME direction are not an overlap sandwich
    val same = l.join(r, col("lo1") <= col("hi2") && col("hi1") <= col("lo2"))
    val ps = same.queryExecution.executedPlan.toString
    // both run L→R: no R→L conjunct, so the rule must not fire
    assert(ps.contains("NestedLoop") || ps.contains("CartesianProduct"),
      s"same-direction pair must pass through, plan:\n$ps")
  }

  test("q_session_overlap plans NestedLoop-free through the rule") {
    val p = SparkEntry.queries("q_session_overlap")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"plan:\n$p")
  }
}
