package graft

import graft.functions.DpNoise
import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DP noise-source seam: the hash stand-in reproduces the exact
  * documented inverse-CDF arithmetic (golden-checked against an
  * independent JVM replication), the SecureRandom source runs the
  * SAME mechanism code end-to-end, and on a landscape where the
  * mechanism's answer is noise-invariant the two sources release the
  * IDENTICAL value — the source-independence claim that reduces the
  * "not private" caveat to the choice of one argument.
  */
class DpSeamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Independent replication of the engine's md5-60-bit convention. */
  private def md5Hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("hash stand-in Laplace matches an independent inverse-CDF replication") {
    import spark.implicits._
    val events = Seq.fill(37)("click").map(Tuple1(_)).toDF("event_type")
    val row = EventsOps.dpCounts(events).collect()(0)
    assert(row.getLong(1) == 37L)
    // Replicate: u = ((md5("click|dp1") % 999999 + 0.5) / 1e6) − 0.5,
    // noise = round(−sign(u)·ln(1 − 2|u|), 6), release = round(n + noise, 6).
    val u = (md5Hash60("click|dp1") % 999999 + 0.5) / 1000000.0 - 0.5
    val noise = BigDecimal(-math.signum(u) * math.log1p(-2 * math.abs(u)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = BigDecimal(37.0 + noise)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(2) - want) < 1e-9,
      s"got ${row.getDouble(2)}, replicated $want")
  }

  test("crypto source runs the same Laplace mechanism with sane noise") {
    import spark.implicits._
    val events = (1 to 500).map(_ => "purchase").map(Tuple1(_))
      .toDF("event_type")
    val row = EventsOps.dpCounts(events, DpNoise.Crypto).collect()(0)
    assert(row.getLong(1) == 500L)
    val release = row.getDouble(2)
    // P(|Laplace(1)| > 40) = e^(−40): a failure here means the
    // mechanism, not the tail, is broken.
    assert(!release.isNaN && math.abs(release - 500.0) < 40.0,
      s"crypto release $release implausibly far from 500")
  }

  test("peaked landscape: both sources release the identical exact median") {
    import spark.implicits._
    // 380 of 400 rows at 42.00: the utility gap (≥ 0.45·n·ε/2 = 90)
    // dwarfs both sources' bounded Gumbel ranges (hash grid ≤ ~14.5;
    // SecureRandom doubles ≤ −ln(−ln(1−2⁻⁵³)) ≈ 37), so the
    // exponential mechanism MUST pick the true median under either.
    val vals = (1 to 400).map(i =>
      if (i <= 380) ("purchase", 42.0) else ("purchase", 10.0 + i % 7))
    val events = vals.toDF("event_type", "value")
    val hash = EventsOps.dpQuantile(events).collect()(0)
    val crypto = EventsOps.dpQuantile(events, DpNoise.Crypto).collect()(0)
    assert(hash.getDouble(3) == 42.0, s"hash released ${hash.getDouble(3)}")
    assert(crypto.getDouble(3) == 42.0,
      s"crypto released ${crypto.getDouble(3)}")
    assert(hash.getDouble(2) == crypto.getDouble(2)) // true_median agrees
  }

  test("crypto draws are not key-reproducible (the stand-in's defect is gone)") {
    import spark.implicits._
    // Same key, two evaluations: the hash path is bit-identical by
    // design; the crypto path must NOT be (64 independent SecureRandom
    // doubles colliding has probability ~2⁻⁵³ per pair).
    val keys = (1 to 64).map(i => Tuple1(s"k$i")).toDF("k")
    def draw(): Seq[Double] =
      keys.select(DpNoise.uniformOpen(DpNoise.Crypto, col("k")).as("u"))
        .collect().map(_.getDouble(0)).toSeq
    val a = draw(); val b = draw()
    assert(a != b, "SecureRandom draws must differ across runs")
    assert(a.forall(u => u > 0.0 && u < 1.0))
    def hashDraw(): Seq[Double] =
      keys.select(DpNoise.uniformOpen(DpNoise.HashStandIn, col("k")).as("u"))
        .collect().map(_.getDouble(0)).toSeq
    assert(hashDraw() == hashDraw(), "hash stand-in must be bit-stable")
  }
}
