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
  * The monotone-bucket argument needs FINITE values, and the explode
  * needs a bounded span, so each side routes its rows through
  * [[Binning.safeSpan]] exactly like [[RangeBinJoin]]: safe×safe
  * pairs take the binned equi-join; the residual pairs — unsafe-left
  * against everything, plus safe-left against unsafe-right, a clean
  * partition of what the binned branch cannot see — take exact
  * fallback joins that evaluate the ORIGINAL predicate row-by-row,
  * hint-BROADCAST on their filtered unsafe side. Each residual exists
  * ONLY when that side's plan-time stats pass ([[Binning.sideStats]])
  * proves unsafe rows can exist — AQE does not propagate empty
  * relations through broadcast stages, so an always-on residual would
  * re-scan the other side per query even when empty; a side whose
  * one-pass stats show every length finite and under the span cap
  * (or a provably-safe LocalRelation) skips its filter and residual,
  * keeping clean-data plans as lean as before the guard existed.
  * NULL bounds drop from every branch, which is exact: they cannot
  * satisfy the original inequalities of an inner join.
  *
  * Scope guards: inner joins only; deterministic condition; the two
  * cross-side `≤`/`<` conjuncts must run in OPPOSITE directions
  * (L→R and R→L) over numeric expressions; no existing cross-side
  * equi key (which also keeps this rule off [[RangeBinJoin]]'s
  * output — its blocked join has a bucket equi key); never re-fires
  * on its own or a sibling rule's output (the [[Binning.MarkerPrefix]]
  * blanket guard — a residual join's condition is still an overlap
  * sandwich, so the marker is what stops a second rewrite).
  *
  * Bin width is a performance knob only, never correctness:
  * candidates scale with intervals-per-bucket², minimized when the
  * width is near the typical interval length. It is STATS-DERIVED at
  * rule-fire time from the same per-side one-pass stats: each side's
  * median |hi − lo| (driver-side for LocalRelations, one
  * column-pruned aggregate job otherwise, cached per canonicalized
  * plan) quantized to a power of two; the rule takes the LARGER of
  * the two sides' widths (bounding fan-out on both) and falls back to
  * [[IntervalOverlapJoin.BinWidth]] (1800 — epoch-second session
  * spans) when no pass can run. q_session_overlap runs the naive
  * spelling through this rule; IntervalRuleSpec pins brute-force
  * equality with multiplicity, the binned plan shape, residual
  * exactness for NaN/Inf/sentinel rows, and the adaptive width.
  */
object IntervalOverlapJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val IkName = "__graft_ik"
  private val IksName = "__graft_iks"

  /** Fallback bin width when the stats probe cannot run. */
  val BinWidth = 1800.0

  /** Width chosen by the most recent rewrite (test observability). */
  @volatile var lastWidth: Double = BinWidth

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

  private def bucketOf(e: Expression, width: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(width)))

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
      hi: Expression, width: Double): (LogicalPlan, Attribute) = {
    val seq = Alias(new Sequence(bucketOf(lo, width), bucketOf(hi, width),
      None, Some(SQLConf.get.sessionLocalTimeZone)), IksName)()
    val proj = Project(child.output :+ seq, child)
    val k = AttributeReference(IkName, LongType, nullable = true)()
    val gen = Generate(Explode(seq.toAttribute),
      unrequiredChildIndex = Seq(child.output.size),
      outer = false, qualifier = None, generatorOutput = Seq(k), child = proj)
    (gen, k)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if cond.deterministic
          && !Binning.hasMarker(left) && !Binning.hasMarker(right)
          && !hasEquiKey(cond, left, right) =>
      overlapSandwich(cond, left, right) match {
        case None => j
        case Some((loL, hiL, loR, hiR)) =>
          val statsL = Binning.sideStats(left, loL, hiL)
          val statsR = Binning.sideStats(right, loR, hiR)
          val width = math.max(Binning.widthOf(statsL, BinWidth),
            Binning.widthOf(statsR, BinWidth))
          lastWidth = width
          val needL = Binning.unsafePossible(statsL, width)
          val needR = Binning.unsafePossible(statsR, width)
          val safeL = Binning.safeSpan(loL, hiL, width)
          val safeR = Binning.safeSpan(loR, hiR, width)
          val binnedL = if (needL) Filter(safeL, left) else left
          val binnedR = if (needR) Filter(safeR, right) else right
          val (lgen, lk) = explodeBuckets(binnedL, loL, hiL, width)
          val (rgen, rk) = explodeBuckets(binnedR, loR, hiR, width)
          val blocked = Join(lgen, rgen, Inner, Some(EqualTo(lk, rk)),
            JoinHint.NONE)
          val canonical = EqualTo(lk,
            Greatest(Seq(bucketOf(loL, width), bucketOf(loR, width))))
          val binned =
            Project(j.output, Filter(And(cond, canonical), blocked))
          val bcast = Some(HintInfo(strategy = Some(BROADCAST)))
          // Residual pairs partition cleanly: (unsafe L × all R) and
          // (safe L × unsafe R) — together with safe×safe they cover
          // every pair exactly once.
          val res1 =
            if (!needL) None
            else {
              val marked = Project(
                left.output :+ Alias(Literal(true), IkName)(),
                Filter(Not(safeL), left))
              Some(Project(j.output,
                Join(marked, right, Inner, Some(cond),
                  JoinHint(bcast, None))))
            }
          val res2 =
            if (!needR) None
            else {
              val marked = Project(
                right.output :+ Alias(Literal(true), IkName)(),
                Filter(Not(safeR), right))
              Some(Project(j.output,
                Join(binnedL, marked, Inner, Some(cond),
                  JoinHint(None, bcast))))
            }
          val branches = binned +: (res1.toSeq ++ res2.toSeq)
          if (branches.size == 1) binned
          else Union(branches, byName = false, allowMissingCol = false)
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
