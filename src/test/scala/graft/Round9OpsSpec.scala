package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts for this session's additions, starting with
  * the RFM scorer: a planted 4-user cohort whose exact quartile
  * boundaries (and therefore 1-4 scores) are derivable by hand.
  */
class Round9OpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // ---- q_rfm ----

  test("rfmScored assigns hand-derived quartile scores on a planted cohort") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-31 00:00:00")
    def at(daysBefore: Int) =
      new java.sql.Timestamp(base.getTime - daysBefore * 86400000L)
    // Purchases per user: u1 is best on all three axes, u4 worst.
    //   recency days:   u1=0  u2=10 u3=20 u4=30  → quartiles 7.5/15/22.5
    //   frequency:      u1=8  u2=4  u3=2  u4=1   → quartiles 1.75/3/5
    //   monetary (sum): u1=8  u2=4  u3=2  u4=1   → same boundaries ×1e6
    val rows =
      (1 to 8).map(i => (1L, at(if (i == 1) 0 else 5), "purchase", 1.0)) ++
        (1 to 4).map(_ => (2L, at(10), "purchase", 1.0)) ++
        (1 to 2).map(_ => (3L, at(20), "purchase", 1.0)) ++
        Seq((4L, at(30), "purchase", 1.0),
          // non-purchase event pins the anchor at `base`
          (5L, at(0), "view", 0.0))
    val ev = rows.toDF("user_id", "ts", "event_type", "value")
    val got = EventsOps.rfmScored(ev)
      .select("user_id", "r_score", "f_score", "m_score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 4L, 4L, 4L), (2L, 3L, 3L, 3L), (3L, 2L, 2L, 2L), (4L, 1L, 1L, 1L)))
  }

  test("q_rfm: segment counts cover all purchase users exactly once") {
    val rows = SparkEntry.queries("q_rfm")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nUsers = rows.map(_.getLong(4)).sum
    val purchasers = graft.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(nUsers == purchasers)
    // scores live in [1, 4]
    rows.foreach { r =>
      for (i <- 0 to 2) assert(r.getLong(i) >= 1 && r.getLong(i) <= 4)
    }
  }
}
