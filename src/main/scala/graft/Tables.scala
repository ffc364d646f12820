package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver testdata tables (TESTDATA.md / FIXTURES.md).
  *
  * All readers are plain `spark.read.parquet` so Catalyst's vectorized
  * parquet source, predicate pushdown and column pruning apply untouched.
  * At 100 TB these would be partitioned/bucketed tables behind a catalog;
  * the per-query code below never assumes a row count, never collects
  * unbounded data to the driver, and keys every shuffle explicitly.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")

  /** `events.ts` is parquet `TIMESTAMP(NANOS)`, which Spark's reader
    * rejects outright (`PARQUET_TYPE_ILLEGAL`). The session must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` at build time (see
    * [[GraftSession]]) so we read the physical INT64 nanos and truncate
    * to microsecond timestamps with integer division (`div`, not `/` —
    * double division loses precision above 2^53 and epoch-nanos is
    * ~2^60). DuckDB-side oracles must compare on `CAST(ts AS
    * TIMESTAMP)`, which truncates ns→µs identically. Timestamps stay
    * codegen'd columns; no UDF, and no per-read session mutation.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
