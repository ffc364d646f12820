package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds a session WITH spark.sql.extensions=graft.GraftExtensions
  * and exercises each injected function from pure SQL — the
  * spark-submit user's path. The shared test session must be cleared
  * from the default slot first or getOrCreate would return it (and
  * extensions only apply at session construction); it is restored
  * afterwards for the remaining suites.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions resolve from pure SQL") {
    val shared = TestSpark.spark // materialize before displacing it
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a STATIC conf — inert once a
      // SparkContext exists in the JVM — so the in-process test uses
      // the equivalent programmatic seam; spark-submit users set
      // --conf spark.sql.extensions=graft.GraftExtensions.
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s.sql(
        """SELECT minhash60(array('a b c', 'b c d')) AS mh,
          |  simhash60(array('a', 'b')) AS sh,
          |  hypersig(CAST(array_repeat(0.5D, 64) AS ARRAY<FLOAT>)) IS NOT NULL AS hs_ok,
          |  cent_argmin_l2(
          |    CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |    array(struct(7L AS cent_id, CAST(array(1.0, 0.0) AS ARRAY<FLOAT>) AS ce, 1.0D AS cn2, 1.0D AS cn),
          |          struct(9L AS cent_id, CAST(array(0.0, 1.0) AS ARRAY<FLOAT>) AS ce, 1.0D AS cn2, 1.0D AS cn))) AS cell,
          |  cent_argmin_cos(
          |    CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |    array(struct(7L AS cent_id, CAST(array(1.0, 0.0) AS ARRAY<FLOAT>) AS ce, 1.0D AS cn2, 1.0D AS cn),
          |          struct(9L AS cent_id, CAST(array(0.0, 1.0) AS ARRAY<FLOAT>) AS ce, 1.0D AS cn2, 1.0D AS cn))) AS cell_cos
          |""".stripMargin).collect().head
      assert(row.getSeq[Long](0).length == 16)
      assert(row.getLong(1) != 0L)
      assert(row.getBoolean(2))
      assert(row.getLong(3) == 7L) // nearest by L2 and by cosine
      assert(row.getLong(4) == 7L)
      val rh = s.sql("SELECT rollhash60('abcdef', 3) AS rh").collect().head
      assert(rh.getSeq[Long](0) ==
        Seq("abc", "bcd", "cde", "def").map(graft.functions.RollHash.gramHash))
      s.range(200).createOrReplaceTempView("theta_ext_t")
      val th = s.sql(
        """SELECT theta_estimate(theta_union_agg(sk)) AS u,
          |  theta_intersect_estimate(min(sk), min(sk)) AS i
          |FROM (SELECT id % 2 AS g, theta_sketch_agg(id % 50) AS sk
          |      FROM theta_ext_t GROUP BY id % 2)""".stripMargin).collect().head
      // group 0 sketches the 25 even residues, group 1 the 25 odd;
      // union = 50, self-intersection of either = 25.
      assert(th.getLong(0) == 50L && th.getLong(1) == 25L)
      // Bloom pair: build over 0..99, probe a member and a non-member
      // (bloom guarantees no false negatives; 1000 is far outside).
      s.range(100).createOrReplaceTempView("bloom_ext_t")
      val b = s.sql(
        """SELECT bloom_might_contain(
          |    (SELECT bloom_agg(xxhash64(id)) FROM bloom_ext_t),
          |    xxhash64(42L)) AS hit,
          |  bloom_might_contain(
          |    (SELECT bloom_agg(xxhash64(id)) FROM bloom_ext_t),
          |    xxhash64(1000L)) AS miss""".stripMargin).collect().head
      assert(b.getBoolean(0))
      assert(!b.getBoolean(1))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
