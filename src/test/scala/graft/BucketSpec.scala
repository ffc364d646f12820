package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: both sides written bucketed by the join
  * key into the (temp) warehouse, then joined — the physical plan must
  * contain NO shuffle exchange for the join. This is the 100 TB
  * fact⋈fact answer: pay the partitioning once at write time, join
  * shuffle-free forever after.
  */
class BucketSpec extends AnyFunSuite {

  test("join of tables bucketed on the join key plans without exchanges") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // At sf0.001 the planner would rather broadcast the 1.5k-row side
    // than use the buckets; disable broadcast so the plan shows what
    // happens at real fact⋈fact scale (where broadcast is impossible).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (physical, n) =
      try {
        val joined = spark.table("b_orders")
          .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        (joined.queryExecution.executedPlan.toString, joined.count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(!physical.contains("Exchange"),
      s"bucketed join must be shuffle-free, got plan:\n$physical")
    val expected = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(n == expected)
  }
}
