package graft

import graft.operators.{AnnOps, TextOps}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts for the round-8 additions: planted
  * boilerplate through the line-dedup core, keyword-extraction
  * invariants, and a sequential A-ES reference for the k-means++
  * seeding (the GraphSpec/BpeTrainSpec discipline).
  */
class Round8OpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue

  // ---- q_line_dedup ----

  test("lineDedup cuts a repeated newline line once, keeps first occurrence") {
    import spark.implicits._
    // REAL newline lines: docs 1 and 2 share their banner line
    // verbatim; doc 3 is entirely doc 1's content.
    val banner = "cookie notice applies to this site please accept"
    val bodyA = "alpha beta gamma delta epsilon zeta eta theta"
    val bodyB = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$banner\n$bodyA"),
      (2L, s"$banner\n$bodyB"),
      (3L, s"$banner\n$bodyA"),
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs).orderBy("doc_id").collect()
    // doc 1 first: keeps both lines; doc 2 loses the banner; doc 3
    // (all lines seen before) collapses to the empty string.
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L)))
    val md5Of = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0).getString(3) == md5Of(s"$banner\n$bodyA"))
    assert(got(1).getString(3) == md5Of(bodyB))
    assert(got(2).getString(3) == md5Of(""))
  }

  test("q_line_dedup: the planted boilerplate survives exactly once corpus-wide") {
    // The salted corpus plants the nav banner on EVERY doc, the cookie
    // notice on every third, the footer on every doc — so across all
    // docs the banner must be kept exactly once (in doc 0, its first
    // carrier), and total kept = distinct lines.
    val rows = SparkEntry.queries("q_line_dedup")(spark, dir)
      .collect().sortBy(_.getLong(0))
    // doc 0 carries banner + body + cookie (0 % 3 == 0) + footer and
    // is first for all shared lines: it keeps every one of its lines.
    val d0 = rows.head
    assert(d0.getLong(0) == 0L && d0.getLong(2) == d0.getLong(1),
      s"doc 0 must keep all its lines, got $d0")
    // Every later doc loses at least the banner and the footer.
    rows.tail.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) - 2,
        s"doc ${r.getLong(0)} kept ${r.getLong(2)} of ${r.getLong(1)} — " +
          "boilerplate not cut")
    }
  }

  test("q_line_dedup conserves lines: sum(kept) = distinct lines") {
    val rows = SparkEntry.queries("q_line_dedup")(spark, dir).collect()
    assert(rows.length > 0)
    val kept = rows.map(_.getLong(2)).sum
    val total = rows.map(_.getLong(1)).sum
    assert(kept <= total)
    // every kept count is within [0, n_lines]
    rows.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)))
  }

  // ---- q_keywords ----

  test("keywordsOf surfaces a planted rare term above common filler") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common words here zyzzyva zyzzyva zyzzyva common words"),
      (2L, "common words here again and again common words filler"),
      (3L, "common words more filler text common words filler extra"),
    ).toDF("doc_id", "text")
    val got = TextOps.keywordsOf(docs, 3).collect()
      .map { case Row(d: Long, rk: Long, t: String, _, _) => (d, rk, t) }
    assert(got.count(_._1 == 1L) == 3)
    assert(got.contains((1L, 1L, "zyzzyva")))
  }

  test("q_keywords emits contiguous ranks with non-increasing scores") {
    val rows = SparkEntry.queries("q_keywords")(spark, dir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (d, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"doc $d ranks")
      val scores = sorted.map(_.getDouble(4)).toSeq
      assert(scores == scores.sorted.reverse, s"doc $d scores")
      assert(sorted.length <= TextOps.KeywordsK)
    }
  }

  // ---- q_kmeanspp_init ----

  test("q_kmeanspp_init matches a sequential A-ES reference") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 1048576L + 1.0) / 1048576.0
    }
    // sequential left-to-right folds, mirroring aggregate()/list_sum
    def normSq(a: Array[Float]): Double =
      a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def d2(a: Array[Float], b: Array[Float]): Double =
      r6(normSq(a) - 2.0 * dot(a, b) + normSq(b))
    var chosen = Vector(
      vecs.map { case (id, _) => (id, r6(1000.0 * math.log(u(id)))) }
        .maxBy { case (id, k) => (k, -id) }._1)
    var expected = Vector((0L, chosen.head, 0.0))
    for (i <- 1 until AnnOps.KppSeeds) {
      val picks = vecs.flatMap { case (id, v) =>
        val dd = chosen.map(c => d2(v, vecs.find(_._1 == c).get._2)).min
        if (dd > 0) Some((id, dd, r6(1000.0 * math.log(u(id)) / dd)))
        else None
      }
      val (pid, pd2, _) = picks.maxBy { case (id, _, k) => (k, -id) }
      chosen :+= pid
      expected :+= ((i.toLong, pid, pd2))
    }
    val got = SparkEntry.queries("q_kmeanspp_init")(spark, dir).collect()
      .map { case Row(ord: Long, id: Long, dd: Double) => (ord, id, dd) }
      .toVector
    assert(got == expected)
  }

  test("q_kmeanspp_init seeds are distinct") {
    val ids = SparkEntry.queries("q_kmeanspp_init")(spark, dir)
      .collect().map(_.getLong(1))
    assert(ids.length == AnnOps.KppSeeds && ids.distinct.length == ids.length)
  }

  // ---- q_span_mask ----

  test("q_span_mask matches a sequential masking reference on every doc") {
    val md5Of = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "lower(text) AS text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q_span_mask")(spark, dir).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val toks = docs(r.getLong(0)).split(" ", -1)
      val c = TextOps.SpanCycle
      val lo = TextOps.SpanStart
      val hi = TextOps.SpanStart + TextOps.SpanLen - 1
      def sent(i: Int) = s"<extra_id_${i / c}>"
      val inp = toks.indices.flatMap { i =>
        if (i % c == lo) Some(sent(i))
        else if (i % c > lo && i % c <= hi) None
        else Some(toks(i))
      }.mkString(" ")
      val tgt = toks.indices.flatMap { i =>
        if (i % c == lo) Seq(sent(i), toks(i))
        else if (i % c > lo && i % c <= hi) Seq(toks(i))
        else Nil
      }.mkString(" ")
      val masked = toks.indices.count(i => i % c >= lo && i % c <= hi)
      assert(r.getLong(1) == toks.length.toLong, s"doc ${r.getLong(0)}")
      assert(r.getLong(2) == masked.toLong, s"doc ${r.getLong(0)} n_masked")
      assert(r.getString(4) == md5Of(inp), s"doc ${r.getLong(0)} input")
      assert(r.getString(5) == md5Of(tgt), s"doc ${r.getLong(0)} target")
    }
  }

  // ---- q_tok_fertility ----

  test("tokFertility: a merging lang reaches fertility 1, a fragmenting one stays higher") {
    import spark.implicits._
    // 'hello' dominates pair counts, so 4 of the 8 merges fuse it
    // into one piece; lang B's hapax words never win a merge round
    // against it and stay (mostly) character-split.
    val docs = (1 to 6).map(i => (s"en", "hello hello hello hello")) ++
      Seq(("xx", "qrst uvwx"), ("xx", "yzab cdef"))
    val got = operators.TextOps
      .tokFertility(spark, docs.toDF("lang", "text"), 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (enWords, enPieces, enFert) = got("en")
    assert(enWords == 24L && enPieces == 24L && enFert == 1.0)
    val (_, _, xxFert) = got("xx")
    assert(xxFert > 1.0, s"fragmenting lang fertility $xxFert")
  }

  test("q_tok_fertility invariants: fertility >= 1, chars/piece >= 1") {
    val rows = SparkEntry.queries("q_tok_fertility")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"${r.getString(0)} pieces < words")
      assert(r.getDouble(3) >= 1.0, s"${r.getString(0)} fertility")
      assert(r.getDouble(4) >= 1.0, s"${r.getString(0)} chars/piece")
    }
  }

  // ---- q_ann_recall_curve / q_ivf_imbalance ----

  test("q_ann_recall_curve: recall is non-decreasing in nprobe") {
    val rows = SparkEntry.queries("q_ann_recall_curve")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == operators.AnnOps.RecallSweep.map(_.toLong))
    val recalls = rows.map(_._2)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not drop as nprobe widens: ${recalls.toSeq}")
    assert(recalls.last > 0.0)
  }

  test("q_ann_recall_curve widest point equals q_ann_recall's mean") {
    val curve = SparkEntry.queries("q_ann_recall_curve")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perProbe = SparkEntry.queries("q_ann_recall")(spark, dir).collect()
      .map(_.getLong(1)).sum
    assert(curve(4L) == perProbe,
      s"curve@4 hits ${curve(4L)} != q_ann_recall total $perProbe")
  }

  test("q_ivf_imbalance: sizes sum to the corpus, ranks are a permutation") {
    val rows = SparkEntry.queries("q_ivf_imbalance")(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n)
    assert(rows.map(_.getLong(3)).sorted.toSeq ==
      (1L to rows.length.toLong).toSeq)
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"share sum $shareSum")
  }

  // ---- q_hash_embed ----

  test("q_hash_embed matches a sequential hashing reference on every doc") {
    val D = TextOps.HashDim
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "lower(text) AS text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q_hash_embed")(spark, dir).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val vec = Array.fill(D)(0L)
      docs(r.getLong(0)).split(" ").filter(_.nonEmpty)
        .groupBy(identity).foreach { case (t, occ) =>
          val h = h60(t)
          val sign = if ((h >> 6) % 2 == 0) 1L else -1L
          vec((h % D).toInt) += sign * occ.length
        }
      val md5Of = (s: String) => java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getLong(1) == vec.count(_ != 0).toLong, s"doc ${r.getLong(0)} nnz")
      assert(r.getLong(2) == vec.map(math.abs).sum, s"doc ${r.getLong(0)} l1")
      assert(r.getDouble(3) ==
        r6(math.sqrt(vec.map(x => x * x).sum.toDouble)),
        s"doc ${r.getLong(0)} l2")
      assert(r.getString(4) == md5Of(vec.mkString(",")), s"doc ${r.getLong(0)}")
    }
  }

  // ---- q_time_decay_agg / q_dedup_bloom / q_stream_hash_embed ----

  test("q_time_decay_agg: weights are (0,1], so decayed_n in (0, n_events]") {
    val rows = SparkEntry.queries("q_time_decay_agg")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dn, dv) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(dn > 0.0 && dn <= n.toDouble, s"${r.getString(0)}: $dn vs $n")
      assert(!dv.isNaN)
    }
  }

  test("q_dedup_bloom two-tier result equals the exact anti-join") {
    val bloom = SparkEntry.queries("q_dedup_bloom")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("q_dedup_incremental")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bloom == exact)
  }

  test("q_stream_hash_embed equals the batch embedder row for row") {
    val stream = SparkEntry.queries("q_stream_hash_embed")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    val batch = SparkEntry.queries("q_hash_embed")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    assert(stream == batch)
  }

  // ---- q_sparse_search / q_table_stats / q_kanon_audit ----

  test("q_sparse_search matches dense cosine over the hashed vectors") {
    val D = TextOps.HashDim
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val vecs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "lower(text) AS text").collect()
      .map { r =>
        val v = Array.fill(D)(0L)
        r.getString(1).split(" ").filter(_.nonEmpty).foreach { t =>
          val h = h60(t)
          v((h % D).toInt) += (if ((h >> 6) % 2 == 0) 1L else -1L)
        }
        r.getLong(0) -> v
      }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      r6(dot / (math.sqrt(a.map(x => x * x).sum.toDouble)
        * math.sqrt(b.map(x => x * x).sum.toDouble)))
    }
    val expected = (0L until 5L).flatMap { p =>
      val pv = vecs(p)
      if (pv.forall(_ == 0)) Nil
      else vecs.toSeq
        .filter { case (id, v) => id != p && v.exists(_ != 0) }
        .map { case (id, v) => (p, id, cos(pv, v)) }
        .sortBy { case (_, id, c) => (-c, id) }
        .take(10).zipWithIndex
        .map { case ((pid, id, c), i) => (pid, (i + 1).toLong, id, c) }
    }
    val got = SparkEntry.queries("q_sparse_search")(spark, dir).collect()
      .map { case Row(p: Long, rk: Long, id: Long, c: Double) =>
        (p, rk, id, c)
      }.toSeq
    assert(got == expected)
  }

  test("q_table_stats agrees with direct recomputation") {
    val rows = SparkEntry.queries("q_table_stats")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val n = li.count()
    rows.foreach { case (c, (nRows, nNulls, ndv, mn, mx)) =>
      assert(nRows == n, s"$c n_rows")
      assert(nNulls == 0L, s"$c nulls")
      val direct = li.selectExpr(s"count(DISTINCT $c)").head.getLong(0)
      assert(ndv == direct, s"$c ndv")
      assert(mn <= mx || c != "l_returnflag", s"$c min/max")
    }
    assert(rows("l_returnflag")._3 == 3L)
  }

  test("q_kanon_audit: flags follow n, totals conserve the corpus") {
    val rows = SparkEntry.queries("q_kanon_audit")(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach { r =>
      val (n, flag, sup) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(flag == (if (n >= TextOps.KAnonK) 1L else 0L))
      assert(sup == (if (n >= TextOps.KAnonK) 0L else n))
    }
  }

  // ---- q_embed_dedup_incremental / q_events_anomaly / q_zipf_fit ----

  test("q_embed_dedup_incremental matches a sequential SemDeDup reference") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def normSq(a: Array[Float]): Double =
      a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def d2(a: Array[Float], b: Array[Float]): Double =
      r6(normSq(a) - 2.0 * dot(a, b) + normSq(b))
    def cos(a: Array[Float], b: Array[Float]): Double =
      r6(dot(a, b) / (math.sqrt(normSq(a)) * math.sqrt(normSq(b))))
    val cents = vecs.filter(_._1 < 8)
    def cellOf(v: Array[Float]): Long =
      cents.map { case (cid, c) => (d2(v, c), cid) }.minBy(identity)._2
    val cells = vecs.map { case (id, v) => id -> cellOf(v) }.toMap
    val base = vecs.filter(_._1 < 400)
    val batch = vecs.filter(_._1 >= 400)
    val expected = batch.map { case (id, v) =>
      val dupBase = base.exists { case (a, av) =>
        cells(a) == cells(id) && cos(av, v) >= 0.45
      }
      val dupBatch = batch.exists { case (a, av) =>
        a < id && cells(a) == cells(id) && cos(av, v) >= 0.45
      }
      (id, cells(id),
        if (dupBase) "dup_base" else if (dupBatch) "dup_batch" else "kept")
    }.toSeq
    val got = SparkEntry.queries("q_embed_dedup_incremental")(spark, dir)
      .collect().map { case Row(id: Long, c: Long, st: String) =>
        (id, c, st)
      }.toSeq
    assert(got == expected)
  }

  test("q_events_anomaly: burst logic matches a sequential window replay") {
    val hourly = Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")).as("hour"),
        org.apache.spark.sql.functions.col("event_type"))
      .count().collect()
      .map(r => (r.getString(1), r.getTimestamp(0), r.getLong(2)))
    val got = SparkEntry.queries("q_events_anomaly")(spark, dir).collect()
      .map(r => (r.getString(1), r.getTimestamp(0)) ->
        ((r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got.size == hourly.length)
    hourly.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2.getTime).map(r => (r._2, r._3))
      series.zipWithIndex.foreach { case ((hour, n), i) =>
        val frame = series.slice(math.max(0, i - 24), i).map(_._2)
        val (gn, gBase, gBurst) = got((tpe, hour))
        assert(gn == n, s"$tpe $hour n")
        if (frame.length == 24) {
          val baseSum = frame.sum
          assert(gBase.contains(r6(baseSum.toDouble / 24)), s"$tpe $hour base")
          assert(gBurst.contains(if (n * 24 >= 2 * baseSum) 1L else 0L),
            s"$tpe $hour burst")
        } else {
          assert(gBase.isEmpty && gBurst.isEmpty, s"$tpe $hour partial")
        }
      }
    }
  }

  test("zipfFit lands on slope -1 for an exact 1/rank corpus") {
    import spark.implicits._
    // counts 840/r for ranks 1..8: freq ∝ 1/rank exactly, so
    // log2(freq) = c − log2(rank) and the regression slope is −1.
    val counts = (1 to 8).map(r => (s"tok$r", 840 / r))
    val text = counts.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    val slope = operators.TextOps
      .zipfFit(Seq(("zz", text)).toDF("lang", "text"))
      .collect().head.getDouble(2)
    assert(math.abs(slope + 1.0) < 1e-3, s"slope $slope")
  }

  // ---- q_scd2_pit_join / q_tok_coverage / q_maxsim_rerank ----

  test("q_scd2_pit_join matches a sequential snapshot replay") {
    val dim = operators.EventsOps.scd2Of(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getTimestamp(3),
        Option(r.getTimestamp(4))))
    val t0 = Tables.events(spark, dir)
      .agg(org.apache.spark.sql.functions.min("ts")).head.getTimestamp(0)
    val expected = (0L until 12L).flatMap { i =>
      val t = java.sql.Timestamp.from(t0.toInstant.plusSeconds(3600 * i))
      dim.filter { case (_, _, from, to) =>
        !from.after(t) && to.forall(t.before)
      }.groupBy(_._2).map { case (st, rows) => (i, st, rows.size.toLong) }
    }.toSeq.sorted
    val got = SparkEntry.queries("q_scd2_pit_join")(spark, dir).collect()
      .map { case Row(i: Long, st: String, n: Long) => (i, st, n) }.toSeq
    assert(got == expected)
    // users only ever enter the dimension: per-snapshot totals are
    // non-decreasing
    val totals = got.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._3).sum)
    assert(totals.zip(totals.tail).forall { case (a, b) => a <= b })
  }

  test("q_tok_coverage matches a sequential coverage replay") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lang", "lower(text) AS text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    docs.foreach { case (lang, text) =>
      text.split(" ").filter(_.nonEmpty).foreach(w => counts((lang, w)) += 1)
    }
    val vocabTop = counts.toSeq.groupBy(_._1._2)
      .map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      .sortBy { case (w, n) => (-n, w) }.take(TextOps.VocabCap)
      .map(_._1).toSet
    val expected = counts.toSeq.groupBy(_._1._1).map { case (lang, xs) =>
      val nTok = xs.map(_._2).sum
      val nOov = xs.filterNot(x => vocabTop(x._1._2)).map(_._2).sum
      lang -> ((nTok, nOov, r6(nOov.toDouble / nTok), xs.size.toLong,
        xs.count(x => !vocabTop(x._1._2)).toLong))
    }
    val got = SparkEntry.queries("q_tok_coverage")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
  }

  test("q_maxsim_rerank: bounded scores, contiguous ranks, candidates from the sparse stage") {
    val rows = SparkEntry.queries("q_maxsim_rerank")(spark, dir).collect()
      .map { case Row(p: Long, rk: Long, n: Long, ms: Double) =>
        (p, rk, n, ms)
      }
    assert(rows.nonEmpty)
    val sparse = SparkEntry.queries("q_sparse_search")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val chunksOf = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        s"CAST(ceil(size(split(lower(text), ' ')) / ${TextOps.MsChunk}.0)" +
          " AS DOUBLE) AS nc")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_._4).toSeq
      assert(scores == scores.sorted.reverse, s"probe $p ordering")
      scores.foreach(ms => assert(ms >= 0.0 && ms <= chunksOf(p) + 1e-9,
        s"probe $p score $ms vs ${chunksOf(p)} chunks"))
      rs.foreach(r => assert(sparse((r._1, r._3)), s"candidate leak $r"))
    }
  }

  // ---- q_gap_fill ----

  test("q_gap_fill: dense spine, zero-leading fills, observed rows intact") {
    val rows = SparkEntry.queries("q_gap_fill")(spark, dir).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime,
        r.getLong(2), r.getLong(3)))
    val types = rows.map(_._1).distinct
    val hours = rows.map(_._2).distinct.sorted
    // complete grid: every type × every hour exactly once
    assert(rows.length == types.length * hours.length)
    assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600000L },
      "spine must be a contiguous hourly grid")
    val observed = Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")),
        org.apache.spark.sql.functions.col("event_type"))
      .count().collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime) -> r.getLong(2))
      .toMap
    types.foreach { t =>
      var lastSeen = 0L
      hours.foreach { h =>
        val (_, _, n, gap) = rows.find(r => r._1 == t && r._2 == h).get
        observed.get((t, h)) match {
          case Some(o) =>
            assert(n == o && gap == 0L, s"$t $h observed")
            lastSeen = o
          case None =>
            assert(n == lastSeen && gap == 1L, s"$t $h fill")
        }
      }
    }
  }

  // ---- q_concurrency / q_retention_matrix ----

  test("q_concurrency matches a brute-force interval count per day") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 30L * 60 * 1000000
    val sessions = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._3, e._2)).map(_._3)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var st = sorted.head; var en = sorted.head
      sorted.tail.foreach { t =>
        if (t - en >= gap) { out += ((st, en)); st = t; en = t }
        else en = t
      }
      out += ((st, en)); out
    }.toSeq
    // brute force: at every boundary instant, count covering sessions
    val expected = sessions.flatMap { case (st, en) => Seq(st, en) }
      .map { t =>
        val day = java.time.Instant.ofEpochSecond(t / 1000000)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
        day -> sessions.count { case (st, en) => st <= t && t <= en }
      }
      .groupBy(_._1).map { case (d, xs) => d.toString -> xs.map(_._2).max }
    val got = SparkEntry.queries("q_concurrency")(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (d, n) =>
      assert(got(d) == n.toLong, s"day $d: ${got(d)} vs $n")
    }
  }

  test("q_retention_matrix matches a sequential cohort replay") {
    val ud = Tables.events(spark, dir)
      .selectExpr("user_id", "CAST(date_trunc('day', ts) AS DATE) AS day")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val fd = ud.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min(Ordering.by((d: java.time.LocalDate) =>
        d.toEpochDay))
    }
    val m = ud.map { case (u, d) =>
      (fd(u), d.toEpochDay - fd(u).toEpochDay)
    }.filter(_._2 <= 7)
      .groupBy(identity).map { case ((c, o), xs) => (c, o) -> xs.size.toLong }
    val got = SparkEntry.queries("q_retention_matrix")(spark, dir).collect()
      .map { r =>
        (r.getDate(0).toLocalDate, r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))
      }.toMap
    assert(got.keySet == m.keySet)
    m.foreach { case (k @ (c, _), n) =>
      val (gn, rate) = got(k)
      assert(gn == n, s"$k")
      assert(rate == r6(n.toDouble / m((c, 0L))), s"$k rate")
    }
  }

  // ---- q_funnel_time / q_dataset_card ----

  test("q_funnel_time matches a sequential latency replay") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val views = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val delays = views.toSeq.flatMap { case (u, vt) =>
      val ps = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= vt)
      if (ps.isEmpty) None else Some((ps.map(_._3).min - vt) / 60000000L)
    }.sorted
    def pct(q: Double): Double = {
      val pos = q * (delays.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      r6(delays(lo) + (pos - lo) * (delays(hi) - delays(lo)).toDouble)
    }
    val r = SparkEntry.queries("q_funnel_time")(spark, dir).collect().head
    assert(r.getLong(0) == delays.length.toLong)
    assert(r.getDouble(1) == pct(0.5), s"p50 ${r.getDouble(1)} vs ${pct(0.5)}")
    assert(r.getDouble(2) == pct(0.9), s"p90 ${r.getDouble(2)} vs ${pct(0.9)}")
    assert(r.getLong(3) == delays.max)
  }

  test("q_dataset_card matches a sequential rollup") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lang", "source", "n_chars", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val nDocs = docs.length.toDouble
    val nTokens =
      docs.map(_._4.toLowerCase.split(" ").count(_.nonEmpty).toLong).sum
    val exp = Map(
      "n_docs" -> nDocs,
      "n_tokens" -> nTokens.toDouble,
      "n_langs" -> docs.map(_._1).distinct.length.toDouble,
      "n_sources" -> docs.map(_._2).distinct.length.toDouble,
      "mean_doc_tokens" -> r6(nTokens / nDocs),
      "short_doc_share" -> r6(docs.count(_._3 < 100) / nDocs),
      "dup_rate" -> r6(1.0 - docs.map(_._4).distinct.length / nDocs))
    val got = SparkEntry.queries("q_dataset_card")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == exp)
  }

  // ---- q_hll_partials ----

  test("q_hll_partials: sketch-union rollup passes both determinism flags") {
    val rows = SparkEntry.queries("q_hll_partials")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)} users")
      assert(r.getLong(2) == 1L, s"${r.getString(0)} within_5pct")
      assert(r.getLong(3) == 1L, s"${r.getString(0)} union_eq_direct")
    }
  }
}
