package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Internal verify kernels for [[graft.plans.OverlapJoinBlocking]]'s
  * size-only mode: set-intersection COUNT and FIRST element over two
  * arrays that the rule has already SORTED ascending and DEDUPLICATED
  * (the same `sort_array(array_distinct(s))` it slices prefixes
  * from). A two-pointer merge walk replaces `array_intersect`'s
  * per-evaluation hash-set build — no allocation, byte-order
  * compares only — which matters because the walk runs once per
  * CANDIDATE pair, the hot loop of the whole blocked join (measured
  * 42 s → see BENCH.md on q_jaccard_join's dense corpus).
  *
  * CONTRACT (callers are the optimizer rule, never user code): both
  * children are sorted-ascending, element-distinct, null-free
  * `array<string>`. On that contract,
  * `SortedIntersectCount(a, b) ≡ size(array_intersect(a, b))` and
  * `SortedIntersectFirst(a, b) ≡ array_min(array_intersect(a, b))`
  * (first common element of sorted inputs IS the minimum; null when
  * the intersection is empty). SortedIntersectSpec pins both
  * equivalences property-style, and the rule's own brute-equality
  * specs cover the planted end-to-end paths. UTF8String.compareTo is
  * the same binary ordering sort_array uses for strings, so the walk
  * and the slice agree on one total order.
  */
abstract class SortedIntersectBase extends BinaryExpression {
  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<string>), got " +
        s"(${left.dataType}, ${right.dataType})")
  override def nullable: Boolean = true
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends SortedIntersectBase {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersect.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

case class SortedIntersectFirst(left: Expression, right: Expression)
    extends SortedIntersectBase {
  override def dataType: DataType = StringType
  override def prettyName: String = "sorted_intersect_first"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.first(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // Boxed temp via ctx.freshName (the CosSim/CentAssign discipline:
  // names derived from ev.value fail Janino in the unsafe-projection
  // path, silently dropping to interpreted mode).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sif")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $r =
         |  graft.functions.SortedIntersect.first($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectFirst =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {

  /** SQL-name seam (used by SortedIntersectSpec to drive both eval
    * paths; the optimizer rule plants the expressions directly). */
  def register(s: org.apache.spark.sql.SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      Portable.arity("sorted_intersect_count", 2)(es =>
        SortedIntersectCount(es(0), es(1))),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_first",
      Portable.arity("sorted_intersect_first", 2)(es =>
        SortedIntersectFirst(es(0), es(1))),
      "built-in")
  }

  /** |a ∩ b| by two-pointer merge; see the contract above. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** min(a ∩ b) (the first merge match), or null when disjoint. */
  def first(a: ArrayData, b: ArrayData)
      : org.apache.spark.unsafe.types.UTF8String = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val cmp = x.compareTo(b.getUTF8String(j))
      if (cmp == 0) return x
      else if (cmp < 0) i += 1
      else j += 1
    }
    null
  }
}
