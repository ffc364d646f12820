package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when
  * SQL-expressible) the byte-equivalent DuckDB oracle the driver runs
  * for the correctness gate. Keeping both halves side by side in the
  * operator modules prevents name/semantics drift — `SparkEntry` just
  * concatenates module registries.
  *
  * Queries end in a deterministic ORDER BY because the oracle hash
  * compare needs stable output; that trailing sort is output-sized and
  * range-partitioned, and a production pipeline consuming the result
  * as a table would simply drop it.
  *
  * @param doc one-line scale note: how this operator behaves at 100 TB
  *            (partitioning, shuffle shape, broadcast decisions).
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
)(val run: (SparkSession, String) => DataFrame)
