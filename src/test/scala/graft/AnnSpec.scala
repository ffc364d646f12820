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

  test("q_embed_centroids: tight label 0 scores higher than split label") {
    val rows = SparkEntry.queries("q_embed_centroids")(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(0)._1 == 3 && rows(1)._1 == 1)
    assert(rows(1)._2 == 1.0) // single-vector label: cos to own centroid = 1
    assert(rows(0)._2 < 1.0 && rows(0)._2 > 0.8)
  }
}
