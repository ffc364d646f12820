package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_bitext_mine: margin-based mutual-best mining must recover planted
  * cross-side "translations" exactly, and its output must satisfy the
  * mutual/margin/parity invariants on real data.
  */
class BitextSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val D = 64

  private def basis(i: Int, scale: Float = 1.0f): Array[Float] = {
    val a = new Array[Float](D); a(i) = scale; a
  }
  private def plus(a: Array[Float], b: Array[Float]): Array[Float] =
    a.zip(b).map { case (x, y) => x + y }

  test("planted cross-side twins are mined, and nothing else") {
    import spark.implicits._
    // ids 0..7: orthogonal anchor vectors (the vec_id < 8 centroid
    // rule), equidistant from every planted cluster so routing is
    // exercised but harmless. Pairs i = 0..9: side-0 vector e_i (id
    // 10+2i), side-1 twin e_i + 0.05*e_32 (id 11+2i) — cosine ~0.9988
    // to its twin, exactly 0 to every other cross-side vector, so the
    // margin criterion must select precisely the 10 twin pairs.
    val anchors = (0 until 8).map(i =>
      (i.toLong, basis(54 + i), i % 2))
    val planted = (0 until 10).flatMap { i =>
      Seq((10L + 2 * i, basis(i), 0),
        (11L + 2 * i, plus(basis(i), basis(32, 0.05f)), 1))
    }
    val dir = java.nio.file.Files.createTempDirectory("bitext").toString
    (anchors ++ planted).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q_bitext_mine")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val expect = (0 until 10).map(i => (10L + 2 * i, 11L + 2 * i)).toSet
    assert(got.map(p => (p._1, p._2)).toSet == expect,
      s"mined ${got.toSeq} != planted $expect")
    assert(got.forall(_._3 > 1.0), "twin margins must clearly exceed 1")
  }

  test("real-data output: mutual, cross-parity, margin >= 1, one pair per anchor") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_bitext_mine")(spark, dir).collect()
    assert(out.nonEmpty)
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val as = out.map(_.getLong(0))
    assert(as.distinct.length == as.length, "one mined pair per side-0 vector")
    assert(out.map(_.getLong(1)).distinct.length == out.length,
      "mutual-best implies one mined pair per side-1 vector too")
    out.foreach { r =>
      assert(labels(r.getLong(0)) % 2 == 0 && labels(r.getLong(1)) % 2 == 1,
        "pairs must cross sides")
      assert(r.getDouble(3) >= 1.0)
    }
  }
}
