package graft

import graft.operators.EventsOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Top-level for encoder codegen (the [[Doc]] convention). */
case class AnEv(ts: Timestamp, event_type: String)
case class LrEv(x: Long, hit: Long)

/** The three round-11 stream twins must equal their batch faces at an
  * ADVERSARIAL micro-batch split — slices cutting THROUGH hours, not
  * between them — because each folds a purely additive rollup
  * (hour×type counts, hour counts, hour sufficient statistics). The
  * finished readouts are then bit-identical to the batch operators.
  */
class Round11StreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def at(day: Int, hr: Int): Timestamp =
    Timestamp.valueOf(f"2024-02-$day%02d $hr%02d:30:00")

  test("anomaly stream state reproduces the batch burst table exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // 30 contiguous hours of 2 events/hour, then a 6-event burst
    // hour: the trailing-24 baseline is complete from hour 24 on.
    val rows = (0 until 30).flatMap { h =>
      val n = if (h == 28) 6 else 2
      (0 until n).map(_ => AnEv(at(1 + h / 24, h % 24), "click"))
    }
    val src = MemoryStream[AnEv]
    val q = EventsOps.hourlyTypeRollup(src.toDF()).writeStream
      .format("memory").queryName("an_state")
      .outputMode("complete").start()
    try {
      val (s1, rest) = rows.splitAt(17)
      val (s2, s3) = rest.splitAt(23)
      src.addData(s1); q.processAllAvailable()
      src.addData(s2); q.processAllAvailable()
      src.addData(s3); q.processAllAvailable()
      val streamed = EventsOps.anomalyFinish(spark.table("an_state"))
        .collect().map(_.toSeq).toSeq
      val batch = EventsOps.anomalyFinish(
        EventsOps.hourlyTypeRollup(rows.toDF()))
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(batch.count(r => r(4) == 1L) == 1, "exactly the planted burst")
    } finally q.stop()
  }

  test("ewma stream state reproduces the batch control chart exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // 18 flat hours at 4/hour then a SUSTAINED shift to 8/hour — the
    // pattern EWMA exists for (a one-hour spike inflates σ faster
    // than the smoothed z can chase it): by hour 24 the smoothed
    // deviation crosses the σ limit, identically from stream state
    // and batch rows.
    val rows = (0 until 26).flatMap { h =>
      val n = if (h >= 18) 8 else 4
      (0 until n).map(_ => AnEv(at(1 + h / 24, h % 24), "view"))
    }
    val src = MemoryStream[AnEv]
    val q = EventsOps.hourRollup(src.toDF()).writeStream
      .format("memory").queryName("ew_state")
      .outputMode("complete").start()
    try {
      val (s1, s2) = rows.splitAt(41)
      src.addData(s1); q.processAllAvailable()
      src.addData(s2); q.processAllAvailable()
      val streamed = EventsOps.ewmaControl(
        EventsOps.seriesOf(spark.table("ew_state")))
        .collect().map(_.toSeq).toSeq
      val batch = EventsOps.ewmaControl(
        EventsOps.seriesOf(EventsOps.hourRollup(rows.toDF())))
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(batch.head(3).asInstanceOf[Long] >= 1, "the spike flags")
    } finally q.stop()
  }

  test("logreg stream state reproduces the batch IRLS fit exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val rows = (0 until 200).map { i =>
      val x = i % 20
      LrEv(x.toLong, if ((i * 7) % 20 < x) 1L else 0L)
    }
    val src = MemoryStream[LrEv]
    val q = src.toDF().groupBy("x")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("hit")).as("h"))
      .writeStream
      .format("memory").queryName("lr_state")
      .outputMode("complete").start()
    try {
      val (s1, s2) = rows.splitAt(73)
      src.addData(s1); q.processAllAvailable()
      src.addData(s2); q.processAllAvailable()
      val streamed = EventsOps.logregFit(spark.table("lr_state"))
        .collect().map(_.toSeq).toSeq
      val batch = EventsOps.logregIrls(rows.toDF())
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(batch.head(3).asInstanceOf[Double] > 0,
        "hit rate rises with x, so the learned slope is positive")
    } finally q.stop()
  }
}
