package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: plan `JOIN ... ON size(array_intersect(a, b)) >= T`
  * as a PREFIX-FILTERED token equi-join (AllPairs / PPJoin family,
  * Bayardo et al. 2007) instead of the quadratic nested loop it
  * otherwise becomes — the third member of the declarative-scale rule
  * family beside [[FuzzyJoinBlocking]] (edit distance) and
  * [[HammingBandJoin]] (Hamming radius).
  *
  * A set-overlap predicate has no equi keys, so Spark's join selection
  * is stuck with BroadcastNestedLoopJoin / CartesianProduct — every
  * executor evaluating every |L|·|R| pair, a shape that cannot
  * hash-partition at all. The prefix-filter theorem fixes that
  * declaratively: order each (deduplicated) token set by ANY global
  * total order and keep its first |s| − T + 1 tokens; if |A∩B| ≥ T,
  * the two prefixes MUST share a token (otherwise ≥ T distinct tokens
  * of each set rank after its whole prefix — impossible). So the rule
  * rewrites
  *
  *   Join(L, R, Inner, size(array_intersect(a, b)) >= T [AND rest])
  *
  * into
  *
  *   Project(L.out ++ R.out,
  *     Filter(originalCondition AND ok = array_min(array_intersect(lpfx, rpfx)),
  *       Join(explode(prefix(a)) over L, explode(prefix(b)) over R,
  *            Inner, ok_l = ok_r)))
  *
  * The original condition re-applies in full (prefix collisions are
  * candidates, not answers; extra conjuncts ride along), and the
  * canonical-token filter keeps exactly ONE of the up-to-|prefix|
  * matches per qualifying pair — multiplicity preserved with no
  * distinct shuffle, the [[FuzzyJoinBlocking]] trick. Rows with fewer
  * than T distinct tokens get an empty prefix and are dropped by
  * Generate (they cannot satisfy the predicate anyway).
  *
  * The global order here is LEXICOGRAPHIC (array_sort on the strings),
  * which makes prefix, intersect and array_min consistent with zero
  * extra machinery. Production tuning orders tokens by ascending
  * document frequency instead — rare tokens first shrink candidate
  * lists dramatically on skewed vocabularies — which needs a stats
  * broadcast and stays an operator-level refinement (the q_cooccur
  * df-pruning shape), not a planner concern: any total order is
  * CORRECT, the order only tunes pruning.
  *
  * Scope guards: inner joins only; both sides `array<string>` with
  * containsNull = false (array_intersect treats null elements as
  * equal, the blocking equi-join would not — split()-produced arrays
  * are null-free, which is the shape this rule targets); no existing
  * cross-side equi key (blocking would only multiply an already
  * partitionable join); never re-fires on its own output (the
  * `__graft_ok` marker).
  *
  * Cost: fan-out is the prefix length per input row, map-side; the
  * one shuffle is token-keyed and AQE-skew-splittable. Worth it
  * whenever |L|·|R| dwarfs Σ_token df_prefix(token)² — everywhere the
  * nested loop is the alternative. q_overlap_join runs through this
  * rule; OverlapRuleSpec pins result equality with the un-rewritten
  * plan and the NestedLoop-free shape.
  */
object OverlapJoinBlocking extends Rule[LogicalPlan] with PredicateHelper {

  private val OkName = "__graft_ok"
  private val OpfxName = "__graft_opfx"

  /** overlap ≥ T in its literal spellings; returns (a, b, T ≥ 1). */
  private def overlapPredicate(e: Expression)
      : Option[(Expression, Expression, Int)] = e match {
    case GreaterThanOrEqual(Size(ArrayIntersect(a, b), _),
        Literal(t: Int, IntegerType)) if t >= 1 =>
      Some((a, b, t))
    case GreaterThan(Size(ArrayIntersect(a, b), _),
        Literal(t: Int, IntegerType)) if t >= 0 =>
      Some((a, b, t + 1))
    case LessThanOrEqual(Literal(t: Int, IntegerType),
        Size(ArrayIntersect(a, b), _)) if t >= 1 =>
      Some((a, b, t))
    case LessThan(Literal(t: Int, IntegerType),
        Size(ArrayIntersect(a, b), _)) if t >= 0 =>
      Some((a, b, t + 1))
    case _ => None
  }

  /** First |distinct(s)| − T + 1 tokens of the lexicographically
    * sorted distinct set (empty when |distinct(s)| < T — slice length
    * clamps to 0). */
  private def prefixExpr(s: Expression, t: Int): Expression = {
    val sorted = SortArray(ArrayDistinct(s), Literal(true))
    Slice(sorted, Literal(1),
      Greatest(Seq(Subtract(Size(sorted), Literal(t - 1)), Literal(0))))
  }

  private def explodePrefix(child: LogicalPlan, s: Expression, t: Int)
      : (LogicalPlan, Attribute, Attribute) = {
    val pfx = Alias(prefixExpr(s, t), OpfxName)()
    val proj = Project(child.output :+ pfx, child)
    val ok = AttributeReference(OkName, StringType, nullable = true)()
    val gen = Generate(Explode(pfx.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ok), child = proj)
    (gen, ok, pfx.toAttribute)
  }

  /** The [[FuzzyJoinBlocking]] re-blocking guard: a join that already
    * has a plain cross-side equality key is hash-partitionable as
    * written. */
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

  private def nullFreeStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.output.exists(_.name == OkName)
          && !right.output.exists(_.name == OkName)
          && !hasEquiKey(cond, left, right) =>
      val hit: Option[(Expression, Expression, Int)] =
        splitConjunctivePredicates(cond).iterator.flatMap { p =>
          overlapPredicate(p).flatMap { case (x, y, t) =>
            if (!nullFreeStringArray(x) || !nullFreeStringArray(y)) None
            else if (x.references.subsetOf(left.outputSet)
                && y.references.subsetOf(right.outputSet)) Some((x, y, t))
            else if (y.references.subsetOf(left.outputSet)
                && x.references.subsetOf(right.outputSet)) Some((y, x, t))
            else None
          }
        }.take(1).toList.headOption
      hit match {
        case None => j
        case Some((a, b, t)) =>
          val (lgen, lk, lpfx) = explodePrefix(left, a, t)
          val (rgen, rk, rpfx) = explodePrefix(right, b, t)
          val blocked = Join(lgen, rgen, Inner, Some(EqualTo(lk, rk)),
            JoinHint.NONE)
          val canonical = EqualTo(lk, ArrayMin(ArrayIntersect(lpfx, rpfx)))
          Project(j.output, Filter(And(cond, canonical), blocked))
      }
  }

  /** In-code seam for an already-built session (the spark-submit-time
    * seam is `--conf spark.sql.extensions=graft.GraftExtensions`).
    * Idempotent. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(OverlapJoinBlocking)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ OverlapJoinBlocking
    }
}
