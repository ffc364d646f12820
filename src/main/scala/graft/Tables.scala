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

  /** `events.ts` has shipped in two physical generations of the
    * testdata: parquet `TIMESTAMP(NANOS)` — which Spark's reader
    * rejects outright (`PARQUET_TYPE_ILLEGAL`) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * [[GraftSession]]) surfaces it as INT64 epoch-nanos — and plain
    * `TIMESTAMP(MICROS)` with `isAdjustedToUTC=false`, which Spark
    * reads as `TIMESTAMP_NTZ`. [[normalizeTs]] folds both into the
    * session-zoned `TIMESTAMP` (µs) every downstream operator,
    * window, and `java.sql.Timestamp` encoder expects, so a testdata
    * regeneration can't silently change query semantics. DuckDB-side
    * oracles compare on `CAST(ts AS TIMESTAMP)`, identical under both
    * generations (ns truncates to µs; µs is a no-op). The session
    * timezone is pinned to UTC, so the NTZ→TIMESTAMP cast is a
    * reinterpretation, not a wall-clock shift. Timestamps stay
    * codegen'd columns; no UDF, and no per-read session mutation.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeTs(load(s, dir, "events"))

  /** Normalize a `ts` column to session-zoned µs `TIMESTAMP` from
    * either physical generation: INT64 epoch-nanos (`div 1000`, not
    * `/` — double division loses precision above 2^53 and epoch-nanos
    * is ~2^60) or a timestamp type (cast; no-op for `TIMESTAMP`,
    * UTC-reinterpretation for `TIMESTAMP_NTZ`). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
