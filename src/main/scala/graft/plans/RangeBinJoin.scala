package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: plan `JOIN ... ON p >= lo AND p <= hi` (the
  * point-in-interval / range theta join, including every `BETWEEN`
  * spelling) as a BINNED equi-join instead of the nested loop it
  * otherwise becomes — the fourth member of the declarative-scale rule
  * family beside [[FuzzyJoinBlocking]] (edit distance),
  * [[HammingBandJoin]] (Hamming radius), and [[OverlapJoinBlocking]]
  * (set overlap).
  *
  * A pure range predicate has no equi keys, so Spark's join selection
  * falls back to BroadcastNestedLoopJoin / CartesianProduct — every
  * point row tested against every interval. The fixed-width binning
  * identity is exact: with bucket(x) = floor(x / G), lo ≤ p ≤ hi
  * implies bucket(lo) ≤ bucket(p) ≤ bucket(hi) (division by a positive
  * constant and floor are monotone, and cast-to-double is monotone, so
  * the implication survives IEEE evaluation). So the rule rewrites
  *
  *   Join(L, R, Inner, p >= lo AND p <= hi [AND rest])
  *
  * into
  *
  *   Project(L.out ++ R.out,
  *     Filter(originalCondition,
  *       Join(bucket(p) over POINT side,
  *            explode(sequence(bucket(lo), bucket(hi))) over DIM side,
  *            Inner, pk = dk)))
  *
  * The original condition re-applies in full (bucket collisions are
  * candidates, not answers; strict `<`/`>` bounds and extra conjuncts
  * ride along untouched). Unlike the other three rules NO canonical
  * filter is needed: the point side's bucket is single-valued, so a
  * qualifying (point, interval) pair meets on exactly one key —
  * multiplicity is preserved by construction.
  *
  * Null semantics are preserved for free: a null point buckets to
  * null and the equi-join drops it; a null bound nulls the sequence
  * and Generate (outer = false) drops the interval row — in both
  * cases the original predicate would have evaluated to UNKNOWN.
  * An inverted interval (lo > hi) matches nothing through the
  * original predicate; Spark's sequence() walks it backwards, which
  * only creates candidates the verify then rejects — harmless.
  *
  * Scope guards: inner joins only; both bound conjuncts must
  * constrain the SAME point expression (semantic equality) with both
  * bounds from the single opposite side; all three expressions
  * numeric; no existing cross-side equi key (the re-blocking trap:
  * q_interval_join's hand-binned shape already has a bucket key, and
  * wrapping it again would square the fan-out); never re-fires on its
  * own output (the `__graft_bk` marker).
  *
  * Bin width [[RangeBinJoin.BinWidth]] tunes performance only, never
  * correctness: narrow bins replicate long intervals into more
  * (bounded, broadcastable) dim rows; wide bins admit more verify
  * candidates. Production derives it from interval-length stats; any
  * positive width is exact. q_range_join runs the naive spelling
  * through this rule; RangeRuleSpec pins brute-force equality and the
  * NestedLoop-free plan shape.
  */
object RangeBinJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val BkName = "__graft_bk"
  private val BksName = "__graft_bks"

  /** Fixed bin width (performance knob only — see scaladoc). */
  val BinWidth = 8.0

  /** `p >= lo` in its four spellings → (point, bound). */
  private def lowerBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case GreaterThan(p, lo) => Some((p, lo))
      case LessThanOrEqual(lo, p) => Some((p, lo))
      case LessThan(lo, p) => Some((p, lo))
      case _ => None
    }

  /** `p <= hi` in its four spellings → (point, bound). */
  private def upperBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(p, hi) => Some((p, hi))
      case LessThan(p, hi) => Some((p, hi))
      case GreaterThanOrEqual(hi, p) => Some((p, hi))
      case GreaterThan(hi, p) => Some((p, hi))
      case _ => None
    }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  private def bucketOf(e: Expression): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(BinWidth)))

  private def hasEquiKey(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(x, y) =>
        (x.references.subsetOf(left.outputSet)
          && y.references.subsetOf(right.outputSet)) ||
          (y.references.subsetOf(left.outputSet)
            && x.references.subsetOf(right.outputSet))
      case _ => false
    }

  /** (point expr, lo, hi, pointSideIsLeft) when the condition holds a
    * complete cross-side range sandwich. */
  private def rangeSandwich(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val lowers = conjuncts.flatMap(lowerBound(_))
    val uppers = conjuncts.flatMap(upperBound(_))
    (for {
      (p1, lo) <- lowers.iterator
      (p2, hi) <- uppers.iterator
      if p1.semanticEquals(p2) && numeric(p1) && numeric(lo) && numeric(hi)
      side <- {
        val pLeft = p1.references.subsetOf(left.outputSet)
        val pRight = p1.references.subsetOf(right.outputSet)
        val bLeft = lo.references.subsetOf(left.outputSet) &&
          hi.references.subsetOf(left.outputSet)
        val bRight = lo.references.subsetOf(right.outputSet) &&
          hi.references.subsetOf(right.outputSet)
        if (pLeft && bRight) Iterator(true)
        else if (pRight && bLeft) Iterator(false)
        else Iterator.empty
      }
    } yield (p1, lo, hi, side)).take(1).toList.headOption
  }

  private def bucketPoint(child: LogicalPlan, p: Expression)
      : (LogicalPlan, Attribute) = {
    val bk = Alias(bucketOf(p), BkName)()
    (Project(child.output :+ bk, child), bk.toAttribute)
  }

  private def explodeBuckets(child: LogicalPlan, lo: Expression,
      hi: Expression): (LogicalPlan, Attribute) = {
    val seq = Alias(new Sequence(bucketOf(lo), bucketOf(hi), None,
      Some(SQLConf.get.sessionLocalTimeZone)), BksName)()
    val proj = Project(child.output :+ seq, child)
    val dk = AttributeReference(BkName, LongType, nullable = true)()
    val gen = Generate(Explode(seq.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(dk), child = proj)
    (gen, dk)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.output.exists(_.name == BkName)
          && !right.output.exists(_.name == BkName)
          && !hasEquiKey(cond, left, right) =>
      rangeSandwich(cond, left, right) match {
        case None => j
        case Some((p, lo, hi, pointIsLeft)) =>
          val (newLeft, newRight, pk, dk) =
            if (pointIsLeft) {
              val (lp, pk) = bucketPoint(left, p)
              val (rp, dk) = explodeBuckets(right, lo, hi)
              (lp, rp, pk, dk)
            } else {
              val (lp, dk) = explodeBuckets(left, lo, hi)
              val (rp, pk) = bucketPoint(right, p)
              (lp, rp, pk, dk)
            }
          val blocked = Join(newLeft, newRight, Inner,
            Some(EqualTo(pk, dk)), JoinHint.NONE)
          Project(j.output, Filter(cond, blocked))
      }
  }

  /** In-code seam for an already-built session (the spark-submit-time
    * seam is `--conf spark.sql.extensions=graft.GraftExtensions`).
    * Idempotent. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(RangeBinJoin)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RangeBinJoin
    }
}
