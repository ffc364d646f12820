package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the two r10 sampling/LM operators:
  * Neyman allocation on planted strata with known variances, and
  * Kneser-Ney bigram probabilities on a hand-computable corpus.
  */
class NeymanKnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("Neyman allocation: zero-variance stratum gets zero; known sds give closed-form shares") {
    import spark.implicits._
    // stratum A: constant 5.00 (sd 0 — Neyman never samples it);
    // B: half 4.00 / half 6.00 (sd $1.0025... sample sd with n=200);
    // C: half 2.00 / half 8.00 (sd ~$3) with twice the rows.
    // Shares must be ~ (N_h * S_h) renormalized over B and C only.
    val rows =
      (1 to 200).map(_ => ("A", 5.00)) ++
        (1 to 100).map(_ => ("B", 4.00)) ++ (1 to 100).map(_ => ("B", 6.00)) ++
        (1 to 200).map(_ => ("C", 2.00)) ++ (1 to 200).map(_ => ("C", 8.00))
    val p = rows.toDF("event_type", "value")
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum(col("c")).as("sh"),
        sum(col("c") * col("c")).as("qh"))
    val wgt = p.selectExpr("event_type", "nh",
      """CAST(round(nh * sqrt((CAST(nh AS DOUBLE) * qh
        |    - CAST(sh AS DOUBLE) * sh)
        |  / (CAST(nh AS DOUBLE) * (nh - 1))) * 1000000) AS BIGINT)
        |  AS w6""".stripMargin)
    val tot = wgt.agg(sum(col("w6")).as("wtot"))
    val got = wgt.crossJoin(broadcast(tot))
      .selectExpr("event_type",
        "round(CAST(w6 AS DOUBLE) / wtot, 6) AS share",
        "CAST(round(1000 * CAST(w6 AS DOUBLE) / wtot) AS BIGINT) AS alloc")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got(0)._2 == 0.0 && got(0)._3 == 0L,
      s"constant stratum must get nothing: ${got(0)}")
    // reference: sample sds from the planted two-point mixes
    def sd(vals: Seq[Double]): Double = {
      val n = vals.size; val m = vals.sum / n
      math.sqrt(vals.map(v => (v - m) * (v - m)).sum / (n - 1))
    }
    val wB = 200 * sd((1 to 100).map(_ => 400.0) ++ (1 to 100).map(_ => 600.0))
    val wC = 400 * sd((1 to 200).map(_ => 200.0) ++ (1 to 200).map(_ => 800.0))
    val shareC = wC / (wB + wC)
    assert(math.abs(got(2)._2 - shareC) < 1e-5,
      s"C share ${got(2)._2} want $shareC")
    assert(got(1)._3 + got(2)._3 >= 999 && got(1)._3 + got(2)._3 <= 1001)
    // the registered query stays well-formed at sf0.001
    val reg = SparkEntry.queries("q_neyman_alloc")(spark,
      "/root/testdata/sf0.001").collect()
    assert(reg.length == 5 && reg.forall(!_.anyNull))
  }

  test("Kneser-Ney bigram: hand-computed probabilities and per-history normalization") {
    import spark.implicits._
    // corpus: "a b", "a b", "a c" — c(a,b)=2, c(a,c)=1, cu(a)=3,
    // N1+(a,.)=2, N1+(.,b)=N1+(.,c)=1, T=2, Pcont=1/2 each:
    //   P(b|a) = (2-.75 + .75*2*.5)/3 = 2/3
    //   P(c|a) = (max(1-.75,0) + .75)/3 = 1/3   (sums to 1 exactly)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val t = docs.select(col("doc_id"),
      expr("filter(split(lower(text), ' '), x -> x <> '')").as("ws"))
      .filter(size(col("ws")) >= 2)
    val b = t.select(col("doc_id"),
      expr("""explode(zip_with(slice(ws, 1, size(ws) - 1),
        |  slice(ws, 2, size(ws) - 1),
        |  (uu, ww) -> struct(uu AS u, ww AS w)))""".stripMargin).as("uw"))
      .select(col("doc_id"), col("uw.u").as("u"), col("uw.w").as("w"))
    val bc = b.groupBy("u", "w").agg(count(lit(1)).as("cb"))
    val hist = bc.groupBy("u")
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1f"))
    val cont = bc.groupBy("w").agg(count(lit(1)).as("n1b"))
    val tt = bc.agg(count(lit(1)).as("t_types"))
    val d = graft.operators.TextOps.KnDiscount
    val probs = bc.join(hist, Seq("u")).join(cont, Seq("w"))
      .crossJoin(broadcast(tt))
      .selectExpr("u", "w",
        s"""(greatest(cb - $d, 0.0)
           |  + $d * n1f * (CAST(n1b AS DOUBLE) / t_types)) / cu AS p"""
          .stripMargin)
    val pm = probs.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(pm(("a", "b")) - 2.0 / 3) < 1e-12)
    assert(math.abs(pm(("a", "c")) - 1.0 / 3) < 1e-12)
    // per-history normalization: sum_w P(w|u) = 1 for every u
    val sums = probs.groupBy("u").agg(sum(col("p")).as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
    // doc scores through the quantize-then-sum pipeline
    val lp = probs.selectExpr("u", "w",
      "CAST(round(ln(p) * 1000000) AS BIGINT) AS lp6")
    val scores = b.join(lp, Seq("u", "w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(col("lp6")).as("slp"))
      .select(col("doc_id"),
        round(col("slp").cast("double") / (col("n") * lit(1e6)), 6)
          .as("mean_lp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) == -0.405465 && scores(2L) == -0.405465,
      s"ln(2/3) at 6dp: $scores")
    assert(scores(3L) == -1.098612, s"ln(1/3) at 6dp: $scores")
  }
}
