package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** AnnOps on planted 64-dim vectors with known geometry: vec 0 is the
  * probe; vec 10 is colinear (cos 1), vec 11 nearly colinear, vec 12
  * orthogonal. Runs through the registry against a temp dir shaped
  * like the driver testdata.
  */
class AnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    parts.foreach { case (i, v) => a(i) = v }
    a
  }

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ann").toString
    Seq(
      (0L, vec(0 -> 1.0f), 0),
      (10L, vec(0 -> 2.0f), 0),              // colinear with probe
      (11L, vec(0 -> 1.0f, 1 -> 0.1f), 0),   // nearly colinear
      (12L, vec(1 -> 1.0f), 1),              // orthogonal
    ).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q_simsearch ranks colinear > near-colinear > orthogonal") {
    val rows = SparkEntry.queries("q_simsearch")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(10L, 11L, 12L))
    assert(rows(0)._2 == 1.0)
    assert(math.abs(rows(1)._2 - 1.0 / math.sqrt(1.01)) < 1e-5)
    assert(rows(2)._2 == 0.0)
    assert(rows.map(_._3).toSeq == Seq(1L, 2L, 3L))
  }

  test("q_simsearch_lsh finds the colinear neighbor (identical signature)") {
    val rows = SparkEntry.queries("q_simsearch_lsh")(spark, dir).collect()
      .filter(_.getLong(0) == 0L).map(r => (r.getLong(1), r.getDouble(2)))
    // Colinear vectors have identical sign signatures in every band.
    assert(rows.contains((10L, 1.0)), s"got ${rows.toSeq}")
  }

  test("q_simsearch_ivf matches brute force when every cell is probed") {
    // 4 vectors => all are centroids (NumCells=16) and the probe's
    // nprobe=4 covers every cell, so IVF must reproduce q_simsearch.
    val ivf = SparkEntry.queries("q_simsearch_ivf")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val brute = SparkEntry.queries("q_simsearch")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(ivf == brute, s"ivf=$ivf brute=$brute")
  }

  test("q_kmeans_step: every vector assigned; centroid is the exact mean") {
    // Seeds are vec_id < 8, so vec 0 is the only centroid: all 4
    // vectors land in its cell and the recomputed centroid is their
    // elementwise mean — (1+2+1+0)/4 on dim 0, (0+0+0.1+1)/4 on dim 1.
    val rows = SparkEntry.queries("q_kmeans_step")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 64)
    assert(rows.forall(r => r._1 == 0L && r._3 == 4L))
    val c0 = rows.map(r => r._2 -> r._4).toMap
    assert(c0(0L) == 1.0 && c0(1L) == 0.275)
    assert((2L to 63L).forall(c0(_) == 0.0))
  }

  test("q_kmeans_train: fixed point of the planted single-cell geometry") {
    // With one surviving centroid (seed vec 0), every iteration assigns
    // all 4 vectors to it, so 3 unrolled iterations must land on the
    // same elementwise mean q_kmeans_step computes — the loop's fixed
    // point, which also checks iteration plumbing changes nothing when
    // converged.
    val rows = SparkEntry.queries("q_kmeans_train")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 64)
    assert(rows.forall(r => r._1 == 0L && r._3 == 4L))
    val c0 = rows.map(r => r._2 -> r._4).toMap
    assert(c0(0L) == 1.0 && c0(1L) == 0.275)
    assert((2L to 63L).forall(c0(_) == 0.0))
  }

  test("q_simsearch_ivf_learned matches brute force when all cells probed") {
    // 4 vectors: at most 4 learned cells survive training, and
    // nprobe=4 covers them all, so the learned-IVF result must equal
    // q_simsearch exactly (recall 1.0 in the all-probed regime).
    val ivf = SparkEntry.queries("q_simsearch_ivf_learned")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val brute = SparkEntry.queries("q_simsearch")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(ivf == brute, s"ivf=$ivf brute=$brute")
  }

  test("q_simsearch_ivf_learned recall@10 vs brute force on sf0.001") {
    // The real recall/cost trade: nprobe=4 of 16 learned cells touches
    // ~1/4 of the corpus. Recall floor is deliberately conservative —
    // the point is a regression tripwire (a broken quantizer sends
    // recall to ~0), not a benchmark.
    val sf = "/root/testdata/sf0.001"
    def topk(q: String): Map[Long, Set[Long]] =
      SparkEntry.queries(q)(spark, sf).collect()
        .groupBy(_.getLong(0))
        .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val brute = topk("q_simsearch")
    val learned = topk("q_simsearch_ivf_learned")
    val recalls = brute.map { case (p, b) =>
      learned.getOrElse(p, Set.empty).intersect(b).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@10 $mean; per-probe $recalls")
  }

  test("q_pq_search recall@10 vs exact L2 on sf0.001") {
    // Metric-matched: ADC approximates squared-L2, so the ground truth
    // is exact L2 top-10 computed from the raw vectors (NOT the cosine
    // brute-force twin). k=4 codebooks are deliberately coarse; the
    // floor is a regression tripwire — a broken codebook or distance
    // table sends recall to ~chance (10/499 ≈ 0.02).
    val sf = "/root/testdata/sf0.001"
    val raw = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val exact = raw.keys.filter(_ < 5).map { p =>
      p -> raw.keySet.filter(_ != p).toSeq
        .sortBy(n => (d2(raw(p), raw(n)), n)).take(10).toSet
    }.toMap
    val pq = SparkEntry.queries("q_pq_search")(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (p, e) =>
      pq.getOrElse(p, Set.empty).intersect(e).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@10 $mean; per-probe $recalls")
  }

  test("q_embed_quantize: scale, saturation and error bound") {
    val rows = SparkEntry.queries("q_embed_quantize")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 10L, 11L, 12L))
    val byId = rows.map(r => r._1 -> r).toMap
    // vec 0 = e0: scale 1/127, max element quantizes to exactly 127.
    assert(math.abs(byId(0L)._2 - 1.0 / 127) < 1e-6)
    assert(byId(0L)._3 == 127L)
    // Round-clamp error can never exceed half a quantization step.
    rows.foreach { case (id, scale, _, err) =>
      assert(err <= scale / 2 + 1e-9, s"vec $id err $err > scale/2 $scale")
    }
  }

  test("q_sq8_search recall@10 vs brute force on sf0.001") {
    // 8-bit scalar quantization keeps ~0.4% per-dim error; top-10
    // neighbor sets should be nearly identical to full precision. The
    // floor is a tripwire for a broken quantizer (recall → ~chance).
    val sf = "/root/testdata/sf0.001"
    def topk(q: String): Map[Long, Set[Long]] =
      SparkEntry.queries(q)(spark, sf).collect()
        .groupBy(_.getLong(0))
        .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val brute = topk("q_simsearch")
    val sq8 = topk("q_sq8_search")
    val recalls = brute.map { case (p, b) =>
      sq8.getOrElse(p, Set.empty).intersect(b).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 $mean; per-probe $recalls")
  }

  test("q_fps_coreset: covering radius is monotone non-increasing and picks are distinct") {
    val rows = SparkEntry.queries("q_fps_coreset")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(1)).distinct.length == 8, "duplicate picks")
    val radii = rows.drop(1).map(_.getDouble(2))
    // each pick is the farthest remaining point, so the covering
    // radius can only shrink (or hold) as the set grows
    for (i <- 1 until radii.length)
      assert(radii(i) <= radii(i - 1) + 1e-12,
        s"radius grew: ${radii.toSeq}")
    assert(radii.forall(r => r >= 0.0 && r <= 2.0))
  }

  test("q_ivf_delete never returns a tombstoned id and backfills to k") {
    val sf = "/root/testdata/sf0.001"
    val del = SparkEntry.queries("q_ivf_delete")(spark, sf).collect()
    assert(del.forall(_.getLong(1) % 7 != 3), "tombstoned id returned")
    val perProbe = del.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perProbe.values.forall(_ == 10), s"no backfill: ${perProbe.toMap}")
    // removing candidates can only promote others: every surviving
    // member of the plain-IVF top-10 must still be present
    val ivf = SparkEntry.queries("q_simsearch_ivf")(spark, sf).collect()
      .filter(_.getLong(1) % 7 != 3)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val delSets = del.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    ivf.foreach { case (p, surv) =>
      assert(surv.subsetOf(delSets(p)), s"probe $p lost survivors")
    }
  }

  test("q_ivf_rebalance: the split adds one cell and cannot raise the max") {
    val rows = SparkEntry.queries("q_ivf_rebalance")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("before", "after"))
    assert(rows("after")._1 == rows("before")._1 + 1)
    // the hot cell WAS the max; its halves are each <= it, others unchanged
    assert(rows("after")._2 <= rows("before")._2)
  }

  test("q_embed_centroids: tight label 0 scores higher than split label") {
    val rows = SparkEntry.queries("q_embed_centroids")(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(0)._1 == 3 && rows(1)._1 == 1)
    assert(rows(1)._2 == 1.0) // single-vector label: cos to own centroid = 1
    assert(rows(0)._2 < 1.0 && rows(0)._2 > 0.8)
  }

  test("q_graph_ann: beam search recalls at the family bar on sf0.001") {
    // The graph index family at the same recall floor the IVF/PQ
    // families gate (≥ 0.8): B=16, H=4 over the 5-NN graph, entry
    // panel = the per-IVF-cell medoids (space-covering by
    // construction — the fixed low-id panel this replaced measured
    // 0.4–0.8 per probe; the medoid panel holds the mean at the
    // family bar with no extra hop).
    val rows = SparkEntry.queries("q_graph_ann")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length == 5)
    val mean = rows.map(_._2).sum / rows.length
    assert(mean >= 0.8, s"mean recall@10 $mean; per-probe ${rows.toSeq}")
    assert(rows.forall(_._2 > 0.0),
      s"every probe must recall something: ${rows.toSeq}")
  }
}
