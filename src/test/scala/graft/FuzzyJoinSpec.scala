package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for q_fuzzy_join's SymSpell d=1 blocking: the deletion
  * neighborhood must be recall-complete for edit distance <= 1 (the
  * pigeonhole argument, checked exhaustively over a small universe),
  * and the blocked join must reproduce the brute-force cross-join
  * result exactly on a planted typo registry.
  */
class FuzzyJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Reference Levenshtein (classic DP) — independent of both
    * engines' built-ins. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def delKeys(sv: String): Set[String] =
    (sv +: sv.indices.map(i => sv.take(i) + sv.drop(i + 1))).toSet

  test("deletion neighborhood is recall-complete for ED<=1 (exhaustive, |Σ|=2, len<=4)") {
    // Every string over {a,b} up to length 4 — 31 strings, 961 pairs;
    // any pair at Levenshtein distance <= 1 MUST share a key. This is
    // the exact claim the operator's equi-join correctness rests on.
    val univ = (0 to 4).flatMap(n =>
      (0 until (1 << n)).map(m =>
        (0 until n).map(b => if (((m >> b) & 1) == 0) 'a' else 'b').mkString))
    for (x <- univ; y <- univ if lev(x, y) <= 1)
      assert(delKeys(x).intersect(delKeys(y)).nonEmpty,
        s"'$x' ~ '$y' at ED ${lev(x, y)} share no deletion key")
  }

  test("Spark delNeighborhood matches the reference key set") {
    import spark.implicits._
    val words = Seq("spark", "a", "ab", "customer#0042")
    val got = words.toDF("w")
      .select(col("w"), DedupOps.delNeighborhood(col("w")).as("ks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    words.foreach(w => assert(got(w) == delKeys(w), s"keys of '$w'"))
  }

  test("blocked join == brute force on a planted typo registry") {
    import spark.implicits._
    val clean = Seq("gizmo", "gadget", "widget", "sprocket", "flange")
    // Typos: deletion, substitution, insertion, and one ED-2 miss.
    val dirty = Seq("gzmo", "gidget", "widgets", "sprocket", "flangex", "xyzzy")
    val cleanDf = clean.toDF("c")
    val dirtyDf = dirty.toDF("d")
    val blocked = dirtyDf
      .select(col("d"), explode(DedupOps.delNeighborhood(col("d"))).as("k"))
      .join(cleanDf.select(col("c"),
        explode(DedupOps.delNeighborhood(col("c"))).as("k")), "k")
      .select("d", "c").distinct()
      .filter(levenshtein(col("d"), col("c")) <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = (for (d <- dirty; c <- clean if lev(d, c) <= 1) yield (d, c)).toSet
    assert(blocked == brute)
    // "gidget" is ED 1 from BOTH gadget and widget — multi-candidate
    // resolution is a real case, not an artifact.
    assert(brute.count(_._1 == "gidget") == 2)
    assert(!brute.exists(_._1 == "xyzzy")) // ED-2 stays unmatched
  }

  test("q_fuzzy_join resolves every corrupted name at distance exactly 1") {
    val rows = SparkEntry.queries("q_fuzzy_join")(spark, dir).collect()
    val nCustomers = SparkEntry.queries("q_fuzzy_join")(spark, dir)
      .sparkSession.read.parquet(s"$dir/customer.parquet").count()
    assert(rows.length == nCustomers) // one resolution per dirty name
    rows.foreach { r =>
      val (dirty, matched) = (r.getString(1), r.getString(2))
      assert(lev(dirty, matched) == 1, s"$dirty -> $matched")
      assert(r.getLong(3) >= 1L)
    }
    // The corruption deletes one char from a real name, so the true
    // source is always a candidate; the lexicographic-first rule must
    // still recover it for most names (digits sort before most
    // collisions). Guard the resolution from degrading silently.
    val hitRate = rows.count(_.getLong(4) == 1L).toDouble / rows.length
    assert(hitRate >= 0.5, f"hit rate $hitRate%.3f")
  }
}
