package graft

import graft.functions.{Kll, MisraGries}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the round-12 certificate sketches, driven
  * directly on the JVM state machines (no Spark session): whatever the
  * data, the duplicates, the capacity, or the partitioning, the
  * carried certificates must hold — the KLL CDF bracket at every
  * quantile and exact weight conservation; the Misra-Gries sandwich
  * true−Δ ≤ stored ≤ true, absent-key coverage, and the a-priori
  * Δ·(k+1) ≤ n; and in both exact windows, canonical bytes independent
  * of insertion order and split.
  */
object SketchProps extends Properties("sketch-certificates") {

  // Tie-heavy value domain: a coarse grid forces duplicates, the
  // bracket's adversarial case.
  private val genVals: Gen[List[Double]] =
    Gen.chooseNum(1, 400).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 40).map(_.toDouble / 2)))

  private val genParts: Gen[Int] = Gen.oneOf(1, 2, 3, 7, 13)

  private def kllBuild(vals: Seq[Double], parts: Int, k: Int): Array[Byte] = {
    val states = Array.fill(parts)(new Kll.State(k))
    vals.zipWithIndex.foreach { case (v, i) => states(i % parts).update(v) }
    val acc = states.head
    states.tail.foreach(acc.merge)
    Kll.serialize(acc)
  }

  property("kll: bracket + conservation at any k and split") =
    Prop.forAll(genVals, Gen.choose(8, 64), genParts) { (vals, k, parts) =>
      vals.isEmpty || {
        val sk = kllBuild(vals, parts, k)
        val n = vals.length.toDouble
        val eps = Kll.errBound(sk)
        Kll.count(sk) == vals.length.toLong &&
          Seq(0.01, 0.25, 0.5, 0.75, 0.99).forall { q =>
            val v = Kll.quantile(sk, q)
            vals.count(_ < v) / n <= q + eps &&
              vals.count(_ <= v) / n >= q - eps
          }
      }
    }

  property("kll: exact window is canonical and exact under any order/split") =
    Prop.forAll(Gen.listOfN(60, Gen.choose(0, 1000).map(_.toDouble)),
      genParts) { (vals, parts) =>
      val k = 64 // n = 60 < k: no compaction anywhere
      val a = kllBuild(vals, 1, k)
      val b = kllBuild(vals.reverse, parts, k)
      val sorted = vals.sorted
      a.toSeq == b.toSeq && Kll.isExact(a) &&
        Seq(0.1, 0.5, 0.9).forall { q =>
          Kll.quantile(a, q) ==
            sorted(math.max(0, math.ceil(q * vals.length).toInt - 1))
        }
    }

  // Zipf-ish keys: a heavy head plus a long tail.
  private val genKeys: Gen[List[String]] =
    Gen.chooseNum(1, 500).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("heavy"),
        3 -> Gen.oneOf("a", "b", "c"),
        4 -> Gen.choose(0, 80).map(i => s"t$i"),
      )))

  private def mgBuild(keys: Seq[String], parts: Int, k: Int): Array[Byte] = {
    val states = Array.fill(parts)(new MisraGries.State(k))
    keys.zipWithIndex.foreach { case (key, i) => states(i % parts).update(key) }
    val acc = states.head
    states.tail.foreach(acc.merge)
    MisraGries.serialize(acc)
  }

  property("mg: full certificate at any k and split") =
    Prop.forAll(genKeys, Gen.choose(1, 16), genParts) { (keys, k, parts) =>
      keys.isEmpty || {
        val sk = mgBuild(keys, parts, k)
        val d = MisraGries.delta(sk)
        val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
        MisraGries.count(sk) == keys.length.toLong &&
          d * (k + 1) <= keys.length.toLong &&
          truth.forall { case (key, t) =>
            val est = MisraGries.estimate(sk, key)
            est <= t && est >= t - d && (t <= d || est > 0)
          }
      }
    }

  property("mg: exact window is canonical under any order/split") =
    Prop.forAll(Gen.listOfN(100, Gen.oneOf("x", "y", "z", "w")),
      genParts) { (keys, parts) =>
      val a = mgBuild(keys, 1, 8)
      val b = mgBuild(keys.reverse, parts, 8)
      a.toSeq == b.toSeq && MisraGries.delta(a) == 0L &&
        keys.distinct.forall(key =>
          MisraGries.estimate(a, key) == keys.count(_ == key).toLong)
    }

  // ---- weighted-insert faces (the r13 (value, count) rollup faces) ----

  private val genWeighted: Gen[List[(String, Long)]] =
    Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.zip(
        Gen.frequency(
          5 -> Gen.const("heavy"),
          3 -> Gen.oneOf("a", "b", "c"),
          4 -> Gen.choose(0, 60).map(i => s"t$i")),
        Gen.choose(1L, 9L))))

  property("mg weighted: identical logical state to expanded unit inserts") =
    Prop.forAll(genWeighted, Gen.choose(1, 16)) { (pairs, k) =>
      val viaW = new MisraGries.State(k)
      pairs.foreach { case (key, w) => viaW.update(key, w) }
      val viaU = new MisraGries.State(k)
      pairs.foreach { case (key, w) => (1L to w).foreach(_ => viaU.update(key)) }
      viaW.n == viaU.n && viaW.delta == viaU.delta &&
        viaW.logical.toMap == viaU.logical.toMap &&
        MisraGries.serialize(viaW).toSeq == MisraGries.serialize(viaU).toSeq
    }

  property("kll weighted: conservation + bracket of the expanded multiset at any k/split") =
    Prop.forAll(
      Gen.chooseNum(1, 150).flatMap(n => Gen.listOfN(n, Gen.zip(
        Gen.choose(0, 40).map(_.toDouble / 2), Gen.choose(1L, 5000L)))),
      Gen.choose(8, 64), genParts) { (pairs, k, parts) =>
      val states = Array.fill(parts)(new Kll.State(k))
      pairs.zipWithIndex.foreach { case ((v, w), i) =>
        states(i % parts).update(v, w)
      }
      val acc = states.head
      states.tail.foreach(acc.merge)
      val sk = Kll.serialize(acc)
      val n = pairs.map(_._2).sum
      val eps = Kll.errBound(sk)
      def lt(x: Double) = pairs.collect { case (v, w) if v < x => w }.sum
      def le(x: Double) = pairs.collect { case (v, w) if v <= x => w }.sum
      Kll.count(sk) == n &&
        Seq(0.01, 0.25, 0.5, 0.75, 0.99).forall { q =>
          val v = Kll.quantile(sk, q)
          lt(v).toDouble / n <= q + eps && le(v).toDouble / n >= q - eps
        }
    }
}
