package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: plan `JOIN ... ON a.lo <= b.hi AND b.lo <= a.hi`
  * (the INTERVAL-OVERLAP theta join — session concurrency, ad
  * attribution windows, shift overlap) as a binned equi-join — the
  * fifth declarative-scale rule, completing [[RangeBinJoin]]'s
  * point-in-interval case with the interval×interval one.
  *
  * Both sides explode over their intervals' overlapped fixed-width
  * buckets and equi-join on the bucket; the original predicate
  * re-applies as the verify. Unlike the point case a qualifying pair
  * CAN meet in several shared buckets, so the [[FuzzyJoinBlocking]]
  * canonical-key trick returns: keep only the bucket equal to
  * `greatest(bucket(a.lo), bucket(b.lo))`. That bucket is always
  * inside BOTH exploded ranges when the predicate holds — each `lo`
  * is an endpoint of its own range, and the cross constraints
  * `lo_a ≤ hi_b` / `lo_b ≤ hi_a` put each `lo`'s bucket inside the
  * OTHER side's range (floor and division by a positive constant are
  * monotone) — and the argument never assumes lo ≤ hi, so rows with
  * inverted bounds (whose raw predicate can still be true) are
  * handled exactly: Spark's sequence() walks them backwards, covering
  * the same bucket set. Multiplicity is therefore preserved with no
  * distinct shuffle.
  *
  * Null bounds null the sequence and Generate drops the row — the
  * original predicate would have been UNKNOWN. Scope guards: inner
  * joins only; the two cross-side `≤`/`<` conjuncts must run in
  * OPPOSITE directions (L→R and R→L) over numeric expressions; no
  * existing cross-side equi key (which also keeps this rule off
  * [[RangeBinJoin]]'s output — its blocked join has a bucket equi
  * key); never re-fires on its own output (the `__graft_ik` marker).
  *
  * Bin width [[IntervalOverlapJoin.BinWidth]] (1800 — tuned for
  * epoch-second session spans) is a performance knob only, never
  * correctness: candidates scale with sessions-per-bucket², minimized
  * when the width is near the typical interval length; production
  * derives it from interval-length stats. q_session_overlap runs the
  * naive spelling through this rule; IntervalRuleSpec pins
  * brute-force equality with multiplicity and the NestedLoop-free
  * shape.
  */
object IntervalOverlapJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val IkName = "__graft_ik"
  private val IksName = "__graft_iks"

  /** Fixed bin width (performance knob only — see scaladoc). */
  val BinWidth = 1800.0

  /** `x <= y` (or strict) in both spellings → (smaller, larger). */
  private def le(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(x, y) => Some((x, y))
    case LessThan(x, y) => Some((x, y))
    case GreaterThanOrEqual(y, x) => Some((x, y))
    case GreaterThan(y, x) => Some((x, y))
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

  /** (loL, hiL, loR, hiR) when the condition holds the two opposite
    * cross-side inequalities `loL ≤ hiR` and `loR ≤ hiL`. */
  private def overlapSandwich(cond: Expression, left: LogicalPlan,
      right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    val les = splitConjunctivePredicates(cond).flatMap(le(_))
    val l2r = les.filter { case (x, y) =>
      x.references.subsetOf(left.outputSet) && x.references.nonEmpty &&
        y.references.subsetOf(right.outputSet) && y.references.nonEmpty &&
        numeric(x) && numeric(y)
    }
    val r2l = les.filter { case (x, y) =>
      x.references.subsetOf(right.outputSet) && x.references.nonEmpty &&
        y.references.subsetOf(left.outputSet) && y.references.nonEmpty &&
        numeric(x) && numeric(y)
    }
    (for {
      (loL, hiR) <- l2r.iterator
      (loR, hiL) <- r2l.iterator
    } yield (loL, hiL, loR, hiR)).take(1).toList.headOption
  }

  private def explodeBuckets(child: LogicalPlan, lo: Expression,
      hi: Expression): (LogicalPlan, Attribute) = {
    val seq = Alias(new Sequence(bucketOf(lo), bucketOf(hi), None,
      Some(SQLConf.get.sessionLocalTimeZone)), IksName)()
    val proj = Project(child.output :+ seq, child)
    val k = AttributeReference(IkName, LongType, nullable = true)()
    val gen = Generate(Explode(seq.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(k), child = proj)
    (gen, k)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.output.exists(_.name == IkName)
          && !right.output.exists(_.name == IkName)
          && !hasEquiKey(cond, left, right) =>
      overlapSandwich(cond, left, right) match {
        case None => j
        case Some((loL, hiL, loR, hiR)) =>
          val (lgen, lk) = explodeBuckets(left, loL, hiL)
          val (rgen, rk) = explodeBuckets(right, loR, hiR)
          val blocked = Join(lgen, rgen, Inner, Some(EqualTo(lk, rk)),
            JoinHint.NONE)
          val canonical = EqualTo(lk,
            Greatest(Seq(bucketOf(loL), bucketOf(loR))))
          Project(j.output, Filter(And(cond, canonical), blocked))
      }
  }

  /** In-code seam for an already-built session (the spark-submit-time
    * seam is `--conf spark.sql.extensions=graft.GraftExtensions`).
    * Idempotent. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(IntervalOverlapJoin)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ IntervalOverlapJoin
    }
}
