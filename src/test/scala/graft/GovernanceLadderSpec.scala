package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r10 rungs of the release-governance ladder: l-diversity must
  * flag sensitive-homogeneous groups that k-anonymity admits, and
  * t-closeness must score a group's sensitive-distribution distance
  * from the global one with the exact-integer ordinal EMD.
  * Planted-data closed forms, engine queries run at sf0.001 for the
  * plan, planted frames for the semantics.
  */
class GovernanceLadderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("l-diversity flags a large-but-homogeneous group; max_share is the exact modal ratio") {
    import spark.implicits._
    // group A: 10 members, ALL in one balance band (k-anonymous at
    // k=10, l-diversity must fail it); group B: 9 members across 3
    // bands 5/3/1 (passes distinct-3, max_share 5/9).
    val rows =
      (1 to 10).map(i => (0, "A", 100.0)) ++
        ((1 to 5).map(_ => (0, "B", 100.0)) ++
          (1 to 3).map(_ => (0, "B", 2100.0)) ++
          Seq((0, "B", 4100.0)))
    val df = rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      .select(col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_mktsegment"), col("c_acctbal"))
    val b = df.select(col("c_nationkey"), col("c_mktsegment"),
      floor(round(col("c_acctbal") * 100, 0).cast("long") / lit(200000.0))
        .cast("long").as("band"))
    val out = b.groupBy("c_nationkey", "c_mktsegment", "band")
      .agg(count(lit(1)).as("c"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_bands"),
        max(col("c")).as("cmax"))
      .select(col("c_mktsegment"), col("n"), col("n_bands"),
        when(col("n_bands") >= 3, 1L).otherwise(0L).as("l_diverse"),
        round(col("cmax").cast("double") / col("n"), 6).as("max_share"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(out(0) == ("A", 10L, 1L, 0L, 1.0),
      s"homogeneous group must fail l-diversity: ${out(0)}")
    assert(out(1) == ("B", 9L, 3L, 1L, 0.555556), s"got ${out(1)}")
  }

  test("t-closeness: identical distribution gives EMD 0; a point-mass group gets the closed form") {
    import spark.implicits._
    // Types a={1.00}, b={2.00}, c={1.00, 2.00}: the global mix is
    // uniform over {1.00, 2.00}, so c EQUALS the global distribution
    // (EMD exactly 0) while a and b are point masses at closed-form
    // EMD 0.5 — a group matches the global iff it matches the
    // MIXTURE, which the grid construction must get right.
    val rows = Seq(
      ("a", 1.00), ("b", 2.00), ("c", 1.00), ("c", 2.00))
    val e = rows.toDF("event_type", "value")
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("v"))
    // reference EMD via exact fractions (ordinal Li et al. form)
    def emdRef(group: Seq[Double], global: Seq[Double]): Double = {
      val vs = global.distinct.sorted
      val m = vs.size
      val diffs = vs.map { v =>
        val pg = group.count(_ <= v).toDouble / group.size
        val p = global.count(_ <= v).toDouble / global.size
        math.abs(pg - p)
      }
      diffs.sum / (m - 1)
    }
    val global = rows.map(_._2)
    val refA = emdRef(rows.filter(_._1 == "a").map(_._2), global)
    val refC = emdRef(rows.filter(_._1 == "c").map(_._2), global)
    // engine computation (the registered query's core, planted frame)
    val gv = e.groupBy("v").agg(count(lit(1)).as("ctot"))
    val tv = e.groupBy("event_type", "v").agg(count(lit(1)).as("cg"))
    val ty = e.groupBy("event_type").agg(count(lit(1)).as("ng"))
    val tot = e.agg(count(lit(1)).as("nn"), countDistinct(col("v")).as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("v")
    val c = ty.crossJoin(broadcast(gv))
      .join(tv, Seq("event_type", "v"), "left")
      .select(col("event_type"), col("ng"), col("v"), col("ctot"),
        coalesce(col("cg"), lit(0L)).as("cg"))
      .withColumn("cumg", sum(col("cg")).over(w))
      .withColumn("cum", sum(col("ctot")).over(w))
    val got = c.crossJoin(broadcast(tot))
      .groupBy("event_type", "ng", "nn", "m")
      .agg(sum(abs(col("cumg").cast("decimal(38,0)") * col("nn")
        - col("cum").cast("decimal(38,0)") * col("ng"))).as("emd_num"))
      .select(col("event_type"),
        round(col("emd_num").cast("double")
          / (col("ng").cast("double") * col("nn") * (col("m") - 1)), 6)
          .as("emd"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("c") == 0.0 && refC == 0.0,
      s"the mixture-matching group must have EMD 0: $got")
    assert(got("a") == 0.5 && math.abs(got("a") - refA) < 1e-6,
      s"point mass: got ${got("a")} want $refA")
    assert(got("b") == 0.5)
    // the registered query itself stays well-formed at sf0.001
    val reg = SparkEntry.queries("q_tcloseness")(spark,
      "/root/testdata/sf0.001").collect()
    assert(reg.length == 5 && reg.forall(!_.anyNull))
  }
}
