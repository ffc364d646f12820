package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operator cores against hand-exact plants and independent
  * recursions: log-rank on planted cohorts (the hypergeometric e/v
  * terms verified by hand), PACF vs a Scala Durbin-Levinson walk over
  * the ENGINE's own ACF values on the same rounding grid, item-item
  * CF on a planted taste matrix (min-support pruning + exact cosine),
  * and the tone decoder's matched-filter argmax recovered for every
  * salted asset with the margin the fixture proves.
  */
class Round13OpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue

  test("logrank: planted two-cohort deaths with hand-exact chi2") {
    import spark.implicits._
    // A dies at t=1 (×2); B: one death at t=3, one censored at t=3.
    // t=1: d=2, nA=2, nB=2 → e=2·2/4=1, v=2·2·2·2/(16·3)=0.333333
    // t=3: d=1, nA=0, nB=2 → e=0, v=0 (censored B user still at risk)
    // O=2, E=1, V=0.333333 → chi2 = round(1/0.333333, 6) = 3.000003
    val per = Seq(
      (1L, 1L, 0L), (1L, 1L, 0L),
      (0L, 3L, 0L), (0L, 3L, 1L),
    ).toDF("is_a", "lt", "censored")
    val row = operators.EventsOps.logrankOf(per).collect().head
    assert(row.getLong(0) == 2L, "o_a")
    assert(row.getDouble(1) == 1.0, "e_a")
    assert(row.getDouble(2) == 0.333333, "v")
    assert(row.getDouble(3) == 3.000003, "chi2")
    assert(row.getLong(4) == 0L, "3.000003 < 3.841")
  }

  test("logrank: identical arms give chi2 = 0 exactly") {
    import spark.implicits._
    val per = Seq((1L, 2L, 0L), (0L, 2L, 0L), (1L, 5L, 1L), (0L, 5L, 1L))
      .toDF("is_a", "lt", "censored")
    // One pooled death time t=2 with d=2, nA=nB=2 → E_A = 2·2/4 = 1 = O_A.
    val row = operators.EventsOps.logrankOf(per).collect().head
    assert(row.getLong(0) == 1L && row.getDouble(1) == 1.0)
    assert(row.getDouble(3) == 0.0 && row.getLong(4) == 0L)
  }

  test("pacf equals a Durbin-Levinson walk over the engine's own ACF") {
    val acf = SparkEntry.queries("q_acf")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (r1, r2, r3) = (acf(1L), acf(2L), acf(3L))
    val phi22 = r6((r2 - r1 * r1) / (1 - r1 * r1))
    val phi21 = r6(r1 - phi22 * r1)
    val phi33 = r6((r3 - phi21 * r2 - phi22 * r1)
      / (1 - phi21 * r1 - phi22 * r2))
    val got = SparkEntry.queries("q_pacf")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == r1, "lag-1 PACF is the lag-1 ACF by definition")
    assert(got(2L) == phi22)
    assert(got(3L) == phi33)
    assert(got.size == 3)
  }

  test("item_cf: planted taste matrix — support pruning and exact cosine") {
    import spark.implicits._
    // users 1,2,3 share {10,11}; item 12 touches {3,4} only → every
    // pair with 12 has co-support 1 < 3 and is pruned before cosine.
    val ui = Seq(
      (1L, 10L), (1L, 11L),
      (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (3L, 12L),
      (4L, 12L),
    ).toDF("user_id", "item")
    val got = operators.GraphOps.itemCf(ui)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._5))
    assert(got.toSeq == Seq(
      (10L, 11L, 3L, 1.0, 1L),
      (11L, 10L, 3L, 1.0, 1L)),
      "only the (10,11) pair survives min-support; cosine 3/√(3·3) = 1")
  }

  test("cusum: window identity equals the textbook recursion on a planted shift") {
    import spark.implicits._
    // Flat 10s, then a persistent +4 shift: the recursion
    // S_t = max(0, S_{t-1} + x_t - k) must match the window identity
    // exactly, and the shift must eventually alarm.
    val xs = Seq.fill(20)(10L) ++ Seq.fill(12)(14L)
    val series = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }
      .toDF("t", "x")
    val got = operators.EventsOps.cusumOf(series)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    val n = xs.length
    val sx = xs.sum
    val kUp = (sx + n - 1) / n
    val kDn = sx / n
    var sUp = 0L; var sDn = 0L
    val sxx = xs.map(x => x * x).sum
    val h = BigDecimal(5.0 * math.sqrt((n.toLong * sxx - sx * sx).toDouble) / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    xs.zipWithIndex.foreach { case (x, t) =>
      sUp = math.max(0L, sUp + x - kUp)
      sDn = math.max(0L, sDn + kDn - x)
      val (gt, gUp, gDn, alarm) = got(t)
      assert(gt == t && gUp == sUp && gDn == sDn,
        s"t=$t: recursion (${sUp}, ${sDn}) vs window (${gUp}, ${gDn})")
      assert(alarm == (if (sUp > h || sDn > h) 1L else 0L))
    }
    assert(got.last._4 == 1L, "the persistent +4 shift must alarm by the end")
  }

  test("assoc_rules: planted baskets — directed confidence differs by side") {
    import spark.implicits._
    // Item 20 in 4 baskets, item 21 in 3; they co-occur 3 times →
    // conf(21→20) = 1.0 but conf(20→21) = 0.75; lift = 5·3/(4·3) = 1.25.
    val ui = Seq(
      (1L, 20L), (1L, 21L),
      (2L, 20L), (2L, 21L),
      (3L, 20L), (3L, 21L),
      (4L, 20L), (5L, 99L),
    ).toDF("user_id", "item")
    val got = operators.GraphOps.assocRules(ui)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (20L, 21L, 3L, 0.6, 0.75, 1.25, 1L),
      (21L, 20L, 3L, 0.6, 1.0, 1.25, 1L)),
      "support 3/5, confidences 3/4 vs 3/3, lift 5·3/(4·3)")
  }

  test("boruvka mst: planted graph with a hand-known tree, ties broken (w,u,v)") {
    import spark.implicits._
    // Square 1-2-3-4 with diagonal: MST must take the three cheapest
    // non-cycle edges; the two w=5 edges tie and (5,1,2) < (5,3,4)
    // lexicographically, so (1,2) enters and (3,4) is rejected only
    // if it cycles — here (3,4) also enters (no cycle yet), and the
    // w=9 diagonal is excluded.
    val und = Seq(
      (1L, 2L, 5L), (3L, 4L, 5L), (2L, 3L, 7L), (1L, 4L, 9L),
    ).toDF("u", "v", "w")
    val got = operators.GraphOps.boruvkaMst(und)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)
    assert(got.toSeq == Seq((1L, 2L, 5L), (2L, 3L, 7L), (3L, 4L, 5L)))
  }

  test("boruvka mst: disconnected graph yields the spanning FOREST") {
    import spark.implicits._
    val und = Seq(
      (1L, 2L, 3L), (2L, 3L, 4L), (1L, 3L, 9L), // component A: tree {12, 23}
      (10L, 11L, 1L),                           // component B: single edge
    ).toDF("u", "v", "w")
    val got = operators.GraphOps.boruvkaMst(und)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)
    assert(got.toSeq == Seq((1L, 2L, 3L), (2L, 3L, 4L), (10L, 11L, 1L)))
  }

  test("polar rotation recovers a planted 3-4-5 Givens, not just permutations") {
    // X: 5 rows × 4 dims (full rank); R_true rotates dims (0,1) by the
    // exact 3-4-5 angle and flips dim 3 — a genuinely dense orthogonal
    // block, so the solver cannot pass by pattern-matching ±1 entries.
    val x = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 2.0, 0.0, 0.0),
      Array(0.0, 0.0, 3.0, 0.0),
      Array(0.0, 0.0, 0.0, 4.0),
      Array(1.0, 1.0, 1.0, 1.0))
    val rTrue = Array(
      Array(0.6, 0.8, 0.0, 0.0),
      Array(-0.8, 0.6, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0),
      Array(0.0, 0.0, 0.0, -1.0))
    val y = x.map(row => Array.tabulate(4)(j =>
      (0 until 4).map(i => row(i) * rTrue(i)(j)).sum))
    val m = Array.tabulate(4, 4) { (i, j) =>
      x.indices.map(r => x(r)(i) * y(r)(j)).sum
    }
    val got = operators.AnnOps.polarRotation(m)
    for (i <- 0 until 4; j <- 0 until 4)
      assert(math.abs(got(i)(j) - rTrue(i)(j)) < 1e-9, s"R($i)($j)")
  }

  test("granger F matches an independent BigInt-moment reference on sf0.001") {
    val rows = operators.EventsOps.xySeries(spark, dir)
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (x, y)
    val lagged = rows.sliding(2).map { case Array((x1, y1), (x0, y0)) =>
      (y0, x0, y1, x1)
    }.toArray
    def fStat(t0: Array[Long], l1: Array[Long], l2: Array[Long]): Double = {
      val n = BigInt(t0.length)
      def s(a: Array[Long]) = BigInt(a.map(BigInt(_)).sum.toString)
      def sp(a: Array[Long], b: Array[Long]) =
        a.zip(b).map { case (u, v) => BigInt(u) * BigInt(v) }.sum
      def c(sab: BigInt, sa: BigInt, sb: BigInt) = n * sab - sa * sb
      val (sa0, sa1, sa2) = (s(t0), s(l1), s(l2))
      val s00 = c(sp(t0, t0), sa0, sa0); val s10 = c(sp(t0, l1), sa0, sa1)
      val s20 = c(sp(t0, l2), sa0, sa2); val s11 = c(sp(l1, l1), sa1, sa1)
      val s12 = c(sp(l1, l2), sa1, sa2); val s22 = c(sp(l2, l2), sa2, sa2)
      val det = (s11 * s22 - s12 * s12).toDouble
      val br = r6(s10.toDouble / s11.toDouble)
      val b1 = r6((s10 * s22 - s20 * s12).toDouble / det)
      val b2 = r6((s11 * s20 - s12 * s10).toDouble / det)
      r6((b1 * s10.toDouble + b2 * s20.toDouble - br * s10.toDouble)
        * (t0.length - 3)
        / (s00.toDouble - b1 * s10.toDouble - b2 * s20.toDouble))
    }
    val y0 = lagged.map(_._1); val x0 = lagged.map(_._2)
    val y1 = lagged.map(_._3); val x1 = lagged.map(_._4)
    val expect = Map("x->y" -> fStat(y0, y1, x1), "y->x" -> fStat(x0, x1, y1))
    val got = SparkEntry.queries("q_granger")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == expect, s"engine $got vs reference $expect")
  }

  test("hurst: a pure trend reads persistent, an alternating series anti-persistent") {
    import spark.implicits._
    def series(f: Int => Long): org.apache.spark.sql.DataFrame =
      (0 until 128).map(t => (t.toLong, f(t))).toDF("t", "x")
    // x_t = t: R/S grows ∝ w, so the ln-ln slope is 1 exactly (up to
    // the 6dp grids); x_t alternating ±1 around 5: cumdev is bounded
    // at every scale, the textbook anti-persistent extreme.
    val trend = operators.EventsOps.hurstOf(series(t => t.toLong))
      .collect()
    assert(trend.length == 3 && trend.forall(_.getLong(1) > 0))
    val hTrend = trend.head.getDouble(3)
    assert(hTrend > 0.9, s"trend series must read persistent, got $hTrend")
    val alt = operators.EventsOps.hurstOf(series(t => 5L + (t % 2)))
      .collect().head.getDouble(3)
    assert(alt < 0.2, s"alternating series must read anti-persistent, got $alt")
    assert(trend.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
  }

  test("tone decoder recovers the planted period for every asset") {
    import graft.operators.MultimodalOps.{ToneDecoder, ToneWavFixture}
    (0L until 60L).foreach { id =>
      val st = ToneDecoder.decodeOne(id, ToneWavFixture.encode(id))
      val p = ToneWavFixture.period(id)
      val n = ToneWavFixture.frames(id)
      assert(st.n_frames == n)
      assert(st.period_hat == p.toLong, s"asset $id")
      // Brute-force correlation from the closed form the oracle uses.
      def corr(cand: Int): Long =
        (0 until n).map(i => ToneWavFixture.sample(id, i).toLong
          * ToneWavFixture.sq(i, cand)).sum
      assert(st.corr4 == corr(4) && st.corr8 == corr(8)
        && st.corr16 == corr(16))
      val byPeriod = Map(4 -> st.corr4, 8 -> st.corr8, 16 -> st.corr16)
      val others = byPeriod.removed(p).values
      assert(others.forall(_ < byPeriod(p)),
        s"asset $id: argmax margin must be strict")
    }
  }
}
