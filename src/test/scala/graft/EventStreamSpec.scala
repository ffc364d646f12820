package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Top-level so the encoder's generated code can reference it (a
  * class-nested case class forces interpreter-mode projections). */
case class Ev(ts: Timestamp, user_id: Long, event_type: String,
    value: Double, event_id: Long)

/** Drives the streaming twins end-to-end with MemoryStream sources and
  * memory sinks: feed batches, advance the watermark with late-enough
  * event time, assert emitted results.
  */
class EventStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("hourly: tumbling windows emit closed buckets after watermark passes") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.hourly(src.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      src.addData(
        Ev(ts(0), 1, "click", 1.0, 100),
        Ev(ts(10), 1, "click", 2.0, 101),
        Ev(ts(10), 2, "view", 5.0, 102))
      q.processAllAvailable()
      // Advance event time 4h → watermark (2h lag) passes hour 0.
      src.addData(Ev(ts(240), 3, "click", 1.0, 103))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select("event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessions: 30-minute gap splits a user's events into two sessions") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.sessions(src.toDF())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // User 1: events at 0 and 10 (one session), then 60 (new session
      // — gap 50 min > 30). User 2: single event.
      src.addData(
        Ev(ts(0), 1, "click", 1.0, 100),
        Ev(ts(10), 1, "click", 1.0, 101),
        Ev(ts(60), 1, "click", 1.0, 102),
        Ev(ts(5), 2, "view", 1.0, 103))
      q.processAllAvailable()
      src.addData(Ev(ts(400), 9, "click", 1.0, 999)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sessions_out")
        .filter(col("user_id") =!= 9)
        .select("user_id", "n_events", "first_event").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 2L, 100L), (1L, 1L, 102L), (2L, 1L, 103L)))
    } finally q.stop()
  }

  test("sessionizedState: gap split emits in-batch; timeout flushes the tail") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.sessionizedState(src.toDF())
      .writeStream.format("memory").queryName("sess_state_out")
      .outputMode("append").start()
    try {
      // User 1: t0 + t10 (one session), then t60 — the 50-min gap
      // closes the first session within the batch.
      src.addData(
        Ev(ts(0), 1, "click", 1.0, 100),
        Ev(ts(10), 1, "click", 2.0, 101),
        Ev(ts(60), 1, "click", 4.0, 102))
      q.processAllAvailable()
      val inBatch = spark.table("sess_state_out")
        .select("user_id", "n_events", "sum_value", "first_event").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(inBatch == Set((1L, 2L, 3.0, 100L)))
      // Push the watermark (2h lag) past t60+30min: the open tail
      // session times out. Two sentinel batches — the watermark a
      // batch COMPUTES only gates timeouts in the NEXT batch.
      src.addData(Ev(ts(400), 9, "click", 0.0, 900))
      q.processAllAvailable()
      src.addData(Ev(ts(401), 9, "click", 0.0, 901))
      q.processAllAvailable()
      val all = spark.table("sess_state_out")
        .filter(col("user_id") =!= 9)
        .select("user_id", "n_events", "sum_value", "first_event").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(all == Set((1L, 2L, 3.0, 100L), (1L, 1L, 4.0, 102L)))
    } finally q.stop()
  }

  test("debounceState: storms stay suppressed across batches; silence re-admits") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.debounceState(src.toDF())
      .writeStream.format("memory").queryName("deb_out")
      .outputMode("append").start()
    try {
      // Batch 1: burst at +0, +2m, +4m — only the first is kept.
      src.addData(
        Ev(ts(0), 1, "click", 1.0, 100),
        Ev(ts(2), 1, "click", 1.0, 101),
        Ev(ts(4), 1, "click", 1.0, 102),
        Ev(ts(0), 2, "view", 1.0, 200))
      q.processAllAvailable()
      // Batch 2: +8m — 4-minute gap from the LAST batch-1 event (+4m):
      // must stay suppressed. This is the boundary that separates the
      // lag rule from dropDuplicatesWithinWatermark (whose state for
      // the +0 event could have expired, re-admitting +8m) AND from
      // any per-batch lag (no predecessor in this batch → kept).
      src.addData(Ev(ts(8), 1, "click", 1.0, 103))
      q.processAllAvailable()
      // Batch 3: +15m — a true 7-minute silence re-admits the key.
      src.addData(Ev(ts(15), 1, "click", 1.0, 104))
      q.processAllAvailable()
      val kept = spark.table("deb_out")
        .select("event_id").as[Long].collect().toSet
      assert(kept == Set(100L, 200L, 104L))
    } finally q.stop()
  }

  test("attributed: purchases join clicks within the preceding hour only") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.attributed(src.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      src.addData(
        Ev(ts(0), 1, "click", 0.0, 100),
        Ev(ts(30), 1, "purchase", 9.0, 101),  // 30 min after click: joins
        Ev(ts(200), 2, "click", 0.0, 200),
        Ev(ts(290), 2, "purchase", 5.0, 201)) // 90 min after click: outside window
      q.processAllAvailable()
      val rows = spark.table("attr_out")
        .select("user_id", "purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 101L, 100L)))
    } finally q.stop()
  }

  test("attributedOuter: unmatched purchases surface with null click after watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.attributedOuter(src.toDF(), sentinelType = Some("sentinel"))
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    try {
      src.addData(
        Ev(ts(0), 1, "click", 0.0, 100),
        Ev(ts(30), 1, "purchase", 9.0, 101),  // 30 min after click: matches
        Ev(ts(200), 2, "click", 0.0, 200),
        Ev(ts(290), 2, "purchase", 5.0, 201)) // 90 min after click: UNMATCHED
      q.processAllAvailable()
      // The matched pair emits on arrival; the unmatched purchase must
      // NOT have emitted yet — no watermark proves its window closed.
      val early = spark.table("attr_outer_out")
        .select("purchase_id").collect().map(_.getLong(0)).toSet
      assert(early == Set(101L))
      // A far-future sentinel (passes both side filters, joins nothing
      // real) drives the watermark past purchase 201's click window.
      src.addData(Ev(ts(100000), -1, "sentinel", 0.0, -1))
      q.processAllAvailable()
      val rows = spark.table("attr_outer_out")
        .filter(col("user_id") >= 0)
        .select("user_id", "purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(rows == Set((1L, 101L, Some(100L)), (2L, 201L, None)))
    } finally q.stop()
  }

  test("attributedFull: each side's orphans emit only after ITS watermark proof") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.attributedFull(src.toDF(), sentinelType = Some("sentinel"))
      .writeStream.format("memory").queryName("attr_full_out")
      .outputMode("append").start()
    try {
      src.addData(
        Ev(ts(0), 1, "click", 0.0, 100),
        Ev(ts(30), 1, "purchase", 9.0, 101),  // matched pair
        Ev(ts(200), 2, "click", 0.0, 200),    // orphan click (next purchase 90' later)
        Ev(ts(290), 2, "purchase", 5.0, 201)) // orphan purchase
      q.processAllAvailable()
      // Matched pairs emit on arrival; NEITHER orphan may have
      // emitted: the batch-1 watermark is 290' − 120' delay = 170',
      // short of click 200's forward window end (200+60' = 260') and
      // of purchase 201 (290').
      val early = spark.table("attr_full_out")
        .select("purchase_id", "click_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(early == Set((101L, 100L)),
        s"orphans must wait for their proofs, saw $early")
      // Watermark to 390' − 120' = 270': past click 200's forward
      // window (260') — the click orphan releases; purchase 201 (290')
      // is still unproven and must keep waiting.
      src.addData(Ev(ts(390), -1, "sentinel", 0.0, -3))
      q.processAllAvailable()
      val mid = spark.table("attr_full_out").filter(col("user_id") >= 0)
        .select("purchase_id", "click_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(mid == Set((101L, 100L), (-1L, 200L)),
        s"click orphan releases first, purchase must still wait: $mid")
      // Far-future sentinel: purchase 201's proof arrives too.
      src.addData(Ev(ts(100000), -1, "sentinel", 0.0, -4))
      q.processAllAvailable()
      val rows = spark.table("attr_full_out").filter(col("user_id") >= 0)
        .select("user_id", "purchase_id", "click_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows == Set((1L, 101L, 100L), (2L, -1L, 200L), (2L, 201L, -1L)))
    } finally q.stop()
  }

  test("attributedLast: multi-click purchase credits the latest click; ties break by id") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.attributedLast(src.toDF(), sentinelType = Some("sentinel"))
      .writeStream.format("memory").queryName("attr_last_out")
      .outputMode("append").start()
    try {
      src.addData(
        Ev(ts(0), 1, "click", 0.0, 100),
        Ev(ts(30), 1, "click", 0.0, 101),   // later click: must win
        Ev(ts(40), 1, "purchase", 9.0, 102),
        Ev(ts(50), 2, "click", 0.0, 200),
        Ev(ts(50), 2, "click", 0.0, 201),   // same ts: higher id must win
        Ev(ts(60), 2, "purchase", 5.0, 202))
      q.processAllAvailable()
      // The windowed agg waits on the watermark — nothing may emit yet.
      assert(spark.table("attr_last_out").isEmpty)
      src.addData(Ev(ts(100000), -1, "sentinel", 0.0, -1))
      q.processAllAvailable()
      val rows = spark.table("attr_last_out")
        .select("user_id", "purchase_id", "last_click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 102L, 101L), (2L, 202L, 201L)))
    } finally q.stop()
  }

  test("sessionizedState: state survives a checkpointed restart") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val outPath = java.nio.file.Files.createTempDirectory("graft-ckpt-out").toString
    val src = MemoryStream[Ev]
    // The memory sink refuses checkpoint recovery; the parquet file
    // sink is the one with real exactly-once restart semantics anyway.
    def start() = EventStream.sessionizedState(src.toDF())
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // Open a session for user 1, then stop the query mid-session.
    val q1 = start()
    try {
      src.addData(Ev(ts(0), 1, "click", 1.0, 100), Ev(ts(10), 1, "click", 2.0, 101))
      q1.processAllAvailable()
    } finally q1.stop()

    // Restart from the checkpoint: the open session must still be in
    // state, so an event 50 min later closes it as ONE 2-event session
    // plus the new single-event session — not a fresh start.
    val q2 = start()
    try {
      src.addData(Ev(ts(60), 1, "click", 4.0, 102))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outPath)
        .select("user_id", "n_events", "sum_value", "first_event").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(rows == Set((1L, 2L, 3.0, 100L)),
        s"restart must resume the open session, got $rows")
    } finally q2.stop()
  }

  test("deduped: repeated event_id within the watermark is dropped") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.deduped(src.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      src.addData(
        Ev(ts(0), 1, "click", 1.0, 100),
        Ev(ts(1), 1, "click", 1.0, 100), // duplicate id
        Ev(ts(2), 2, "view", 1.0, 101))
      q.processAllAvailable()
      src.addData(Ev(ts(3), 1, "click", 1.0, 100)) // still duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").collect()
        .map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(100L, 101L))
    } finally q.stop()
  }

  test("histogram: stream-computed bins equal the batch histogram exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // Same fixed range both paths — the deployment contract (a stream
    // can't see a global min/max). Values straddle bins and both edges.
    val vals = Seq(-5.0, 0.0, 0.3, 3.7, 5.1, 9.99, 10.0, 42.0)
    val (mn, mx, bins) = (0.0, 10.0, 8)
    val src = MemoryStream[Ev]
    val q = EventStream.histogram(src.toDF(), mn, mx, bins)
      .writeStream.format("memory").queryName("hist_out")
      .outputMode("complete").start()
    try {
      val evs = vals.zipWithIndex.map { case (v, i) =>
        Ev(ts(i), i.toLong, "click", v, 200L + i)
      }
      src.addData(evs.take(4): _*) // two micro-batches: state must merge
      q.processAllAvailable()
      src.addData(evs.drop(4): _*)
      q.processAllAvailable()
      val streamed = spark.table("hist_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = EventStream.histogram(
        evs.toDF(), mn, mx, bins).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // Symmetric out-of-range contract: -5.0 clamps into bin 0 and
      // 10.0/42.0 into bin bins-1 — no negative-bin rows, no mass
      // silently dropped, every bin id inside [0, bins).
      assert(batch.values.sum == vals.size.toLong)
      assert(batch.keys.forall(b => b >= 0 && b < bins))
      assert(batch(0L) == 3L)          // -5.0 (clamped), 0.0 and 0.3
      assert(batch(bins - 1L) == 3L)   // 9.99, 10.0 and 42.0 (clamped)
    } finally q.stop()
  }

  test("transitionsState: per-user state bridges micro-batch boundaries exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.transitionsState(src.toDF())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      // User 1's timeline split mid-stream: the (view -> click) pair
      // straddling the two addData batches must still be emitted —
      // that bridging pair IS the state's reason to exist. User 2
      // interleaves to prove per-user isolation; out-of-order arrival
      // within a batch (event 103 before 102 by time) must be folded
      // in (ts, id) order.
      src.addData(
        Ev(ts(0), 1, "signup", 0, 100),
        Ev(ts(5), 1, "view", 0, 101),
        Ev(ts(12), 2, "click", 0, 110))
      q.processAllAvailable()
      src.addData(
        Ev(ts(20), 1, "purchase", 0, 103), // arrives before 102...
        Ev(ts(10), 1, "click", 0, 102),    // ...but folds by (ts, id)
        Ev(ts(25), 2, "error", 0, 111))
      q.processAllAvailable()
      val streamed = spark.table("trans_out")
        .select("user_id", "prev_type", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val expected = Map(
        (1L, "signup", "view") -> 1, (1L, "view", "click") -> 1,
        (1L, "click", "purchase") -> 1, (2L, "click", "error") -> 1)
      assert(streamed == expected, s"streamed=$streamed")
    } finally q.stop()
  }

  test("transitionsBuffered: adversarial cross-batch disorder pairs exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStream.transitionsBuffered(src.toDF()) // 2h delay
      .writeStream.format("memory").queryName("transx_out")
      .outputMode("append").start()
    def pairs(): Map[(Long, String, String), Int] =
      spark.table("transx_out")
        .select("user_id", "prev_type", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    try {
      // User 1's events arrive REVERSED ACROSS BATCHES: t=50 and t=30
      // in batch 1, the true first event t=10 only in batch 2. The
      // fold-order variant would pair B->C then C->A here; exact
      // semantics demand A->B, B->C.
      src.addData(Ev(ts(50), 1, "C", 0, 103), Ev(ts(30), 1, "B", 0, 102))
      q.processAllAvailable()
      src.addData(Ev(ts(10), 1, "A", 0, 101))
      q.processAllAvailable()
      // Nothing may finalize while the watermark (2h lag) still sits
      // below the events — emission waits for the watermark, that is
      // the contract.
      assert(pairs().isEmpty, s"premature emission: ${pairs()}")
      // Watermark driver: t=200 pushes wm to t=80 > all of user 1;
      // the follow-up batch lets the event-time timeout drain.
      src.addData(Ev(ts(200), 9, "z", 0, 900))
      q.processAllAvailable()
      src.addData(Ev(ts(201), 9, "z", 0, 901))
      q.processAllAvailable()
      assert(pairs() == Map((1L, "A", "B") -> 1, (1L, "B", "C") -> 1),
        s"got ${pairs()}")
      // A row below the watermark is LATE: dropped, never mis-paired
      // (admitting it would pair out of order against finalized
      // history). User 9's own events stay pending (wm < t=200).
      src.addData(Ev(ts(20), 1, "X", 0, 104))
      q.processAllAvailable()
      src.addData(Ev(ts(202), 9, "z", 0, 902))
      q.processAllAvailable()
      assert(pairs() == Map((1L, "A", "B") -> 1, (1L, "B", "C") -> 1),
        s"late row leaked: ${pairs()}")
    } finally q.stop()
  }
}
