package graft

import graft.operators.EventsOps
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_mcnemar's cells and statistics on hand-built flip tables. */
class McnemarSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val pre = Timestamp.valueOf("2024-01-05 00:00:00")
  private val post = Timestamp.valueOf("2024-01-20 00:00:00")

  private def mc(rows: Seq[(Long, String, Timestamp)])
      : (Long, Long, Long, Long, Long, Option[Double], Option[Double]) = {
    import spark.implicits._
    val r = EventsOps.mcnemar(rows.toDF("user_id", "event_type", "ts"))
      .collect().head
    def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), d(5), d(6))
  }

  test("hand-built table: b=5, c=2 -> chi2 = 9/7, cc = 4/7") {
    // 3 users convert both halves, 5 pre-only, 2 post-only, 4 never
    // (a non-purchase event keeps them in the user set).
    val rows =
      (1L to 3L).flatMap(u => Seq((u, "purchase", pre), (u, "purchase", post))) ++
        (4L to 8L).map(u => (u, "purchase", pre)) ++
        (9L to 10L).map(u => (u, "purchase", post)) ++
        (11L to 14L).map(u => (u, "view", pre))
    val (n, n00, n01, n10, n11, chi2, cc) = mc(rows)
    assert((n, n00, n01, n10, n11) == (14L, 4L, 2L, 5L, 3L))
    assert(chi2.contains(math.rint(9.0 / 7 * 1e6) / 1e6), s"chi2: $chi2")
    assert(cc.contains(math.rint(4.0 / 7 * 1e6) / 1e6), s"cc: $cc")
  }

  test("no discordant users -> NULL statistics") {
    val rows = Seq((1L, "purchase", pre), (1L, "purchase", post),
      (2L, "view", pre))
    val (_, n00, _, _, n11, chi2, cc) = mc(rows)
    assert(n00 == 1L && n11 == 1L && chi2.isEmpty && cc.isEmpty)
  }
}
