package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-check for q_lexical_knn against a sequential in-memory
  * reference implementing the same champion-list contract (per-term
  * top-K postings by (tf DESC, doc_id), full-vector norms, 6dp
  * cosine, top-20 by (cosine DESC, ids)).
  */
class LexicalKnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue

  test("q_lexical_knn matches a sequential champion-list reference") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
    val nDocs = docs.length.toDouble
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (id, t, xs.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.length }
    val w = tf.map { case (id, t, f) =>
      (id, t, f, f * math.log(nDocs / df(t)))
    }
    val norm = w.groupBy(_._1).map { case (id, xs) =>
      id -> math.sqrt(xs.map(x => x._4 * x._4).sum)
    }
    val champ = w.groupBy(_._2).values.flatMap { posts =>
      posts.sortBy { case (id, _, f, _) => (-f, id) }
        .take(operators.TextOps.ChampK)
    }.toSeq
    val dots = champ.groupBy(_._2).values.flatMap { posts =>
      for {
        x <- posts; y <- posts if x._1 < y._1
      } yield ((x._1, y._1), x._4 * y._4)
    }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val expect = dots.toSeq.map { case ((a, b), dot) =>
      (a, b, r6(dot / (norm(a) * norm(b))))
    }.sortBy { case (a, b, c) => (-c, a, b) }.take(20)

    val got = SparkEntry.queries("q_lexical_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expect.length)
    for ((e, g) <- expect.zip(got)) assert(g == e, s"expected $e got $g")
  }

  test("q_lexical_knn cosines are valid and rank-ordered") {
    val cos = SparkEntry.queries("q_lexical_knn")(spark, dir)
      .collect().map(_.getDouble(2))
    assert(cos.nonEmpty)
    assert(cos.forall(c => c >= -1e-9 && c <= 1 + 1e-9))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }
}
