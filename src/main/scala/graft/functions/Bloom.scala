package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL seam for Spark's internal bloom-filter pair — the machinery
  * behind Catalyst's own InjectRuntimeFilter rule, exposed as
  * callable functions so a query can apply semi-join reduction
  * EXPLICITLY (the optimizer's injected variant is gated on
  * size-threshold configs that small test SFs never clear):
  *
  *  - `bloom_agg(xxhash64(k))` — distributed, mergeable bloom build:
  *    partial sketches per partition, OR-merged at the coordinator;
  *    the result is one ~1 MB binary regardless of input size.
  *  - `bloom_might_contain(<scalar subquery>, xxhash64(k))` — probe;
  *    Spark requires the bloom side to be a literal or scalar
  *    subquery (the subquery runs once, its binary result is
  *    broadcast into every task as a literal), which is exactly the
  *    shape this seam produces.
  *
  * False positives are expected — a bloom pre-filter must always sit
  * BELOW an exact join that removes them; it pays for itself by
  * shrinking the fact side before the join's shuffle.
  */
object Bloom {
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new BloomFilterAggregate(exprs.head), "built-in")
    // OUR probe expression, not Spark's BloomFilterMightContain: the
    // built-in's codegen breaks (and silently interprets) when the
    // probe folds to a negative literal — see graft.functions.BloomProbe.
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomMightContain(exprs.head, exprs(1)), "built-in")
  }
}
