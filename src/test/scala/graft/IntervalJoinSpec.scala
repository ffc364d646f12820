package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** q_interval_join boundary behavior: quantities on band edges land in
  * exactly one band even where bands straddle the G=8 bucket width
  * (e.g. qty 8 and 9 are bucket 1 but band t1_small starts in bucket
  * 0 — only the per-bucket replication of the band dimension makes
  * them meet), and out-of-band points are dropped.
  */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-interval").toString
    val qtys = Seq(1.0, 8.0, 9.0, 10.0, 24.0, 25.0, 39.0, 40.0, 50.0, 0.5)
    qtys.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("l_orderkey", "l_quantity")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("each boundary quantity joins exactly its band; out-of-band rows drop") {
    val rows = SparkEntry.queries("q_interval_join")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map(
      "t1_small" -> 3L, // 1, 8, 9 — 8 and 9 need the straddled-bucket replica
      "t2_mid" -> 2L,   // 10, 24
      "t3_large" -> 2L, // 25, 39
      "t4_xl" -> 2L,    // 40, 50
    ), s"got $rows")    // 0.5 matches no band
  }
}
