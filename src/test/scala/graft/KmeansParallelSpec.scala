package graft

import graft.operators.{AnnOps, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** q_kmeans_parallel_init against an independent sequential Bahmani
  * reference (plain Scala loops over collected vectors, sharing NONE
  * of the engine's DataFrame machinery) — the KMeansTrainSpec /
  * BpeTrainSpec pattern applied to the oversampled init: every
  * admission decision, weight, and greedy center pick must match.
  */
class KmeansParallelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def roundToLong(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("engine matches the sequential Bahmani reference exactly") {
    val rows = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val vmap = rows.toMap
    val vn2 = rows.map { case (id, v) => id -> dot(v, v) }.toMap
    // The engine's 6dp distance: (vn2 - 2*dot) + cn2, rounded.
    def d2(a: Long, b: Long): Double =
      round6(vn2(a) - 2.0 * dot(vmap(a), vmap(b)) + vn2(b))
    def h60(s: String): Long = TextOps.hash60(s)

    // Seed: the kpp max-key uniform pick.
    val seed = rows.map { case (id, _) =>
      (round6(1000.0 * math.log(
        ((h60(id.toString) % 1048576L) + 1.0) / 1048576.0)), id)
    }.minBy { case (k, id) => (-k, id) }._2
    var cand = Vector((0L, seed)) // (round admitted, vec_id)

    // Oversampling rounds: admit x iff m·φ ≤ 2^20·ℓ·d² in exact ints.
    for (r <- 1 to AnnOps.KbarRounds) {
      val dis = rows.map { case (id, _) =>
        id -> roundToLong(cand.map(c => d2(id, c._2)).min * 1000000.0)
      }.toMap
      val phi = dis.values.sum
      val admitted = rows.flatMap { case (id, _) =>
        val m = (h60(s"$id#b$r") % 1048576L) + 1L
        if (BigInt(m) * BigInt(phi)
            <= BigInt(1048576L * AnnOps.KbarL) * BigInt(dis(id)))
          Some((r.toLong, id))
        else None
      }
      cand = cand ++ admitted
    }
    assert(cand.size > AnnOps.KbarK, "oversampling must out-produce k")

    // Weights: |points whose nearest candidate (6dp, ties by id) is c|.
    val weights = rows.map { case (id, _) =>
      cand.map { case (_, cid) => (d2(id, cid), cid) }.min._2
    }.groupBy(identity).map { case (cid, xs) => cid -> xs.size.toLong }
    // Greedy weighted reduction: argmax w·D² (6dp), ties by id.
    val first = cand.map { case (_, cid) =>
      (weights.getOrElse(cid, 0L), cid)
    }.maxBy { case (w, id) => (w, -id) }._2
    var centers = Vector((0L, first))
    for (i <- 1 until AnnOps.KbarK) {
      val scored = cand.map(_._2).map { cid =>
        (cid, weights.getOrElse(cid, 0L),
          centers.map(g => d2(cid, g._2)).min)
      }.filter(_._3 > 0)
      if (scored.nonEmpty) {
        val pick = scored.maxBy { case (cid, w, dd) =>
          (round6(w.toDouble * dd), -cid)
        }
        centers = centers :+ (i.toLong, pick._1)
      }
    }
    assert(centers.size == AnnOps.KbarK)

    val ordOf = centers.map { case (ord, cid) => cid -> ord }.toMap
    val want = cand.sortBy(_._2).map { case (r, cid) =>
      (cid, r, weights.getOrElse(cid, 0L), ordOf.get(cid))
    }
    val got = SparkEntry.queries("q_kmeans_parallel_init")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toVector
    assert(got == want, s"got:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")
  }

  test("the cost-adaptive schedule admits identically and stops on plateau") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("vn2", expr(
        "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, x) -> a + x)"))
    def candSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ρ=0.5 continues only while a round HALVES the total cost; the
    // marginal candidate stops doing that after a few rounds on real
    // data, so the schedule must stop before a generous cap.
    val (adaptive, rounds) =
      AnnOps.kmeansParallelCandidates(e, 3, maxRounds = 10,
        stopRatio = Some(0.5))
    assert(rounds < 10, s"adaptive schedule never stopped (ran $rounds)")
    assert(rounds >= 1)
    // For the rounds both schedules share, admissions are IDENTICAL —
    // the adaptive path's collected-literal φ is the same exact
    // integer the fixed path keeps in-plan.
    val (fixed, _) =
      AnnOps.kmeansParallelCandidates(e, 3, rounds, stopRatio = None)
    assert(candSet(adaptive) == candSet(fixed))
  }
}
