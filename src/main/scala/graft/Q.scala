package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when
  * SQL-expressible) the byte-equivalent DuckDB oracle the driver runs
  * for the correctness gate. Keeping both halves side by side in the
  * operator modules prevents name/semantics drift — `SparkEntry` just
  * concatenates module registries.
  *
  * @param doc one-line scale note: how this operator behaves at 100 TB
  *            (partitioning, shuffle shape, broadcast decisions).
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
)(val run: (SparkSession, String) => DataFrame)
