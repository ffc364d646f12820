package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, PlanExpression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen-safe replacement for Spark's `BloomFilterMightContain`
  * probe expression.
  *
  * Why it exists: the built-in's `doGenCode` emits
  * `bf.mightContainLong((Long)<value>)`. When the probe side constant
  * folds to a NEGATIVE long literal (e.g. `xxhash64(42L)` →
  * -6876166290308861218L), Janino parses `(Long)-68...L` as
  * "parenthesized expression `Long`, binary minus, literal" and dies
  * with `Expression "java.lang.Long" is not an rvalue` — at which
  * point Spark silently drops the whole projection to interpreted
  * mode. The cast is pointless anyway (`<value>` is already a
  * primitive long for a LongType child); this version emits the call
  * with no cast, so the generated code compiles for every probe
  * shape, literal or column.
  *
  * Semantics are identical to the built-in: the bloom side must be a
  * driver-evaluable constant (binary literal or scalar subquery —
  * the subquery runs once and its serialized sketch is broadcast into
  * every task as a literal); a NULL sketch or NULL probe yields NULL;
  * otherwise `mightContainLong(probe)` with bloom's no-false-negative
  * guarantee.
  */
case class BloomMightContain(bloomFilterExpression: Expression,
    valueExpression: Expression) extends BinaryExpression {

  override def left: Expression = bloomFilterExpression
  override def right: Expression = valueExpression

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => bloomFilterExpression match {
        // Same contract as the built-in: the sketch side must be
        // driver-evaluable once — a constant or a scalar subquery —
        // because it is deserialized a single time per task, not per
        // row (a row-dependent sketch would also defeat the point).
        case e if e.foldable => TypeCheckResult.TypeCheckSuccess
        case _: PlanExpression[_] => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"the bloom side of $prettyName must be a constant or scalar subquery")
      }
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got $other")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  // Deserialized once per task from the constant binary side — the
  // same contract as Spark's built-in (the sketch is a literal or a
  // scalar-subquery result, never row-dependent).
  @transient private lazy val bloomFilter: BloomFilter = {
    val bytes = bloomFilterExpression.eval(null)
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  override def eval(input: InternalRow): Any = {
    if (bloomFilter == null) null
    else {
      val v = valueExpression.eval(input)
      if (v == null) null else bloomFilter.mightContainLong(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloomFilter == null) {
      ev.copy(isNull = TrueLiteral, value = FalseLiteral)
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", bloomFilter,
        classOf[BloomFilter].getName)
      val valueEval = valueExpression.genCode(ctx)
      // No (Long) cast: the child is LongType, so valueEval.value is
      // already a primitive long — and the cast is exactly what broke
      // Janino on folded negative literals.
      ev.copy(code = code"""
        ${valueEval.code}
        boolean ${ev.isNull} = ${valueEval.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${valueEval.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloomFilterExpression = newLeft, valueExpression = newRight)
}
