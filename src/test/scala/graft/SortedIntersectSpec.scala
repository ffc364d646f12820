package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The merge-walk verify kernels behind OverlapJoinBlocking's
  * size-only mode: on sorted-distinct inputs,
  * `SortedIntersectCount ≡ size(array_intersect)` and
  * `SortedIntersectFirst ≡ array_min(array_intersect)` — pinned
  * property-style against Spark's own set ops over a seeded corpus
  * (unicode, empties, disjoint, identical), through BOTH the
  * interpreted path (driver eval) and codegen (a projection over a
  * DataFrame).
  */
class SortedIntersectSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(4242)
  private val vocab = Vector("a", "b", "c", "zz", "ß", "日本", "x1",
    "", "0", "~tilde", "Ʊ", "longer-token-value")

  private def randomSet(): Seq[String] =
    rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
      .distinct.sorted

  test("count and first equal Spark's array ops on 500 random sorted-distinct pairs") {
    import spark.implicits._
    val pairs = Seq.fill(500)((randomSet(), randomSet())) ++
      Seq((Seq.empty[String], Seq.empty[String]),
        (Seq("a"), Seq.empty[String]),
        (vocab.sorted, vocab.sorted))
    graft.functions.SortedIntersect.register(spark)
    val df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      expr("sorted_intersect_count(a, b)").as("cnt"),
      expr("sorted_intersect_first(a, b)").as("first"),
      size(array_intersect(col("a"), col("b"))).as("want_cnt"),
      array_min(array_intersect(col("a"), col("b"))).as("want_first"))
    val rows = df.collect()
    assert(rows.length == pairs.size)
    rows.foreach { r =>
      assert(r.getInt(2) == r.getInt(4),
        s"count mismatch for ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      assert(Option(r.get(3)) == Option(r.get(5)),
        s"first mismatch for ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
    // Sanity: the corpus must exercise nonempty intersections AND the
    // null (disjoint/empty) case.
    assert(rows.exists(_.getInt(2) > 0))
    assert(rows.exists(r => r.get(3) == null))
  }
}
