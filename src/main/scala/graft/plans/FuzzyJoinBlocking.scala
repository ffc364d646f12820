package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: plan `JOIN ... ON levenshtein(a, b) <= 1` as a
  * SymSpell deletion-neighborhood EQUI-join instead of the quadratic
  * nested loop it otherwise becomes.
  *
  * A join whose only condition is an edit-distance predicate has no
  * equi keys, so Spark's join selection is stuck with
  * BroadcastNestedLoopJoin / CartesianProduct — O(|L|·|R|) comparisons
  * and, at scale, a plan that cannot hash-partition at all. But for
  * threshold 1 the blocking identity behind [[graft.operators.DedupOps
  * .delNeighborhood]] is exact: two strings are within edit distance 1
  * iff they share a key in {s} ∪ {s with one char deleted} (insertion:
  * delete the inserted char on the longer side; deletion: the shorter
  * side IS such a key; substitution: delete the changed position on
  * both sides). So the rule rewrites
  *
  *   Join(L, R, Inner, lev(a,b) <= 1 [AND rest])
  *
  * into
  *
  *   Project(L.out ++ R.out,
  *     Filter(originalCondition AND lk = array_min(array_intersect(lks, rks)),
  *       Join(explode(delKeys(a)) over L, explode(delKeys(b)) over R,
  *            Inner, lk = rk)))
  *
  * The original condition re-applies in full (the levenshtein verify
  * prunes key-collision false positives; any extra conjuncts ride
  * along), and the canonical-key filter `lk = min(shared keys)` keeps
  * exactly ONE of the up-to-(len+1) key matches per qualifying row
  * pair — pair multiplicity is preserved without any dedup or row-id
  * bookkeeping, because both key arrays travel with their rows.
  *
  * Null semantics are preserved for free: a null string produces a
  * null key array, Generate drops the row, and the original predicate
  * would have evaluated to UNKNOWN anyway.
  *
  * Scope guards: inner joins only, threshold exactly 1 (d>1 blocking
  * needs multi-deletion neighborhoods — out of scope), plain string
  * sides split cleanly across the join, and the rule never re-fires on
  * its own output (the `__graft_lk` marker), which matters because it
  * runs inside the operator-optimization fixpoint where predicate
  * pushdown can fold the re-applied verify back into the join
  * condition.
  *
  * Cost: the key fan-out is ×(len+1) map-side rows on each input —
  * worth it whenever |L|·|R| dwarfs (len+1)·(|L|+|R|) + collisions,
  * i.e. everywhere the nested loop is the alternative. q_fuzzy_pairs
  * runs through this rule; FuzzyRuleSpec pins result equality with the
  * un-rewritten plan and the NestedLoop-free shape.
  */
object FuzzyJoinBlocking extends Rule[LogicalPlan] with PredicateHelper {

  private val LkName = "__graft_lk"
  private val LksName = "__graft_lks"

  /** {s} ∪ single-char deletions of s, deduped — the resolved-tree
    * twin of DedupOps.delNeighborhood (which builds the unresolved
    * Column form and cannot be spliced into an optimizer rewrite). */
  private def delKeys(s: Expression): Expression = {
    val i = NamedLambdaVariable("i", IntegerType, nullable = false)
    val deleteAt = Concat(Seq(
      Substring(s, Literal(1), Subtract(i, Literal(1))),
      Substring(s, Add(i, Literal(1)), Length(s))))
    ArrayDistinct(Concat(Seq(
      CreateArray(Seq(s)),
      ArrayTransform(
        new Sequence(Literal(1), Length(s), None,
          Some(SQLConf.get.sessionLocalTimeZone)),
        LambdaFunction(deleteAt, Seq(i))))))
  }

  /** lev(a, b) <= 1 in any of its literal spellings. */
  private def edOnePredicate(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(1, IntegerType)) =>
        Some((a, b))
      case LessThan(Levenshtein(a, b, None), Literal(2, IntegerType)) =>
        Some((a, b))
      case EqualTo(Levenshtein(a, b, None), Literal(1, IntegerType)) =>
        Some((a, b))
      case _ => None
    }

  private def explodeKeys(child: LogicalPlan, s: Expression)
      : (LogicalPlan, Attribute, Attribute) = {
    val ks = Alias(delKeys(s), LksName)()
    val proj = Project(child.output :+ ks, child)
    val lk = AttributeReference(LkName, StringType, nullable = true)()
    val gen = Generate(Explode(ks.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(lk), child = proj)
    (gen, lk, ks.toAttribute)
  }

  /** True when any conjunct is a plain cross-side equality — the join
    * already has a hash-partitionable key, so blocking would only
    * square the fan-out (the re-blocking trap: predicate pushdown can
    * fold a hand-blocked join's levenshtein verify back into its
    * key-equality condition, and without this guard the rule would
    * wrap the already-exploded sides in a second neighborhood). */
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.output.exists(_.name == LkName)
          && !right.output.exists(_.name == LkName)
          && !hasEquiKey(cond, left, right) =>
      val hit: Option[(Expression, Expression)] =
        splitConjunctivePredicates(cond).iterator.flatMap { p =>
          edOnePredicate(p).flatMap { case (x, y) =>
            // Orient (a from left, b from right); both plain strings.
            if (x.dataType != StringType || y.dataType != StringType) None
            else if (x.references.subsetOf(left.outputSet)
                && y.references.subsetOf(right.outputSet)) Some((x, y))
            else if (y.references.subsetOf(left.outputSet)
                && x.references.subsetOf(right.outputSet)) Some((y, x))
            else None
          }
        }.take(1).toList.headOption
      hit match {
        case None => j
        case Some((a, b)) =>
          val (lgen, lk, lks) = explodeKeys(left, a)
          val (rgen, rk, rks) = explodeKeys(right, b)
          val blocked = Join(lgen, rgen, Inner, Some(EqualTo(lk, rk)),
            JoinHint.NONE)
          val canonical = EqualTo(lk, ArrayMin(ArrayIntersect(lks, rks)))
          Project(j.output, Filter(And(cond, canonical), blocked))
      }
  }

  /** In-code seam for an already-built session (the
    * spark-submit-time seam is `--conf spark.sql.extensions=
    * graft.GraftExtensions`). Idempotent. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(FuzzyJoinBlocking)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ FuzzyJoinBlocking
    }
}
