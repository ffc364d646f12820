package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` concatenate the per-module [[Q]] registries so
  * every operator the modules define is visible to the driver's
  * correctness gate (Verify → DuckDB compare) and bench.
  */
object SparkEntry {
  private def registry: Seq[Q] =
    operators.MapReduceParity.all ++
      operators.Relational.all ++
      operators.EventsOps.all ++
      operators.DedupOps.all ++
      operators.AnnOps.all ++
      operators.TextOps.all ++
      operators.GraphOps.all ++
      operators.MultimodalOps.all ++
      streaming.StreamOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_wordcount")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
