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
  *     Filter(verify(__shared) AND ok = array_min(__shared),
  *       Project(out :+ __shared = array_intersect(a, b),
  *         Join(explode(prefix(a)) over L, explode(prefix(b)) over R,
  *              Inner, ok_l = ok_r AND rest))))
  *
  * The expensive set build happens EXACTLY ONCE per candidate, in the
  * `__shared` projection below the verify Filter: the original overlap
  * conjunct re-applies with its `array_intersect` subtree swapped for
  * the alias, and the canonical-token filter reads `array_min` of the
  * SAME alias. That last substitution is sound: when |A∩B| ≥ T, the
  * minimum m of A∩B is followed in each side's sorted distinct set by
  * ≥ T−1 further intersection tokens, so m sits within the first
  * |s|−T+1 positions of both — m ∈ pfx(A)∩pfx(B) ⊆ A∩B, hence
  * min(pfx(A)∩pfx(B)) = min(A∩B) for every qualifying pair (and
  * non-qualifying candidates are dropped by the verify regardless of
  * what the canonical comparison says). Cheap residual conjuncts that
  * do not mention the intersect (`doc_a < doc_b` and friends) move
  * into the blocked join's own condition, pruning candidates BEFORE
  * the set build is paid. When the join's direct parent is a Project
  * or Aggregate that recomputes the same `array_intersect` (the
  * `n_shared` output column shape), the rule substitutes the alias
  * there too — zero re-evaluations anywhere in the operator.
  *
  * The canonical filter keeps exactly ONE of the up-to-|prefix|
  * matches per qualifying pair — multiplicity preserved with no
  * distinct shuffle, the [[FuzzyJoinBlocking]] trick. Rows with fewer
  * than T distinct tokens get an empty prefix and are dropped by
  * Generate (they cannot satisfy the predicate anyway).
  *
  * == The global token order ==
  *
  * ANY total order is CORRECT (the theorem only needs consistency
  * across sides); the order tunes PRUNING. The default is
  * LEXICOGRAPHIC — prefix, intersect and array_min consistent with
  * zero extra machinery. On SKEWED vocabularies the rule upgrades to
  * ASCENDING-DOCUMENT-FREQUENCY order (rare tokens first — the
  * AllPairs paper's own tuning: a prefix that avoids hot tokens
  * shrinks candidate lists by orders of magnitude on Zipfian data),
  * fed by a [[Binning]]-style one-pass token-df probe at rule-fire
  * time: explode+count both sides' distinct tokens, take the
  * [[HotK]] most frequent, and fire only when the top df clears
  * [[SkewGate]]× the hot-set floor AND the floor itself is ≤
  * [[MaxRareDf]] (a rare tail must EXIST, not just a hot head — a
  * dense vocabulary whose rarest token still lands in hundreds of
  * docs gains nothing from rare-first and pays the encoding on every
  * row). A near-uniform or dense vocabulary keeps the zero-overhead
  * lexicographic plan, measured unchanged. The order is REALIZED as an injective
  * encoding: token → zero-padded hot-rank ∥ SEP ∥ token, where every
  * token outside the hot set shares rank 0 (rare-first) and hot
  * tokens rank by ascending df — so the ordinary lexicographic
  * machinery (array_sort, array_min, string-equality join keys) now
  * compares BY the df order, and the canonical filter reads
  * array_min of the ENCODED shared intersect. Probe results are
  * cached per canonicalized (left, la, right, ra); staleness here is
  * PERF-ONLY (unlike Binning's residual decision — any total order
  * stays correct on any data), so no data-version fingerprint is
  * needed. Probe failure, a streaming side, or an over-budget side
  * (sampled first, [[Binning.MaxProbeBytes]]) degrade to
  * lexicographic. OverlapDfOrderSpec pins the planted-Zipfian
  * candidate-count drop, result equality on both paths, and the
  * gate staying off on uniform vocabularies.
  *
  * Scope guards: inner joins only; deterministic condition (the
  * verify re-evaluates per candidate row); both sides `array<string>`
  * with containsNull = false (array_intersect treats null elements as
  * equal, the blocking equi-join would not — split()-produced arrays
  * are null-free, which is the shape this rule targets); no existing
  * cross-side equi key (blocking would only multiply an already
  * partitionable join); never re-fires on its own output (the
  * `__graft_ok` marker). The threshold literal matches both INT and
  * BIGINT spellings, with or without the implicit cast analysis wraps
  * around `size(...)` when the literal is long.
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
  private val SharedName = "__graft_shared"

  /** Hot-set size for the df probe: only the most frequent tokens
    * need individual ranks — the candidate blowup IS the hot tokens;
    * the rare tail can share one rank and still sort first. */
  val SkewGate = 8.0
  val HotK = 1024

  /** Rare-tail existence certificate: the df order fires only when
    * the probed floor df (≥ every tail token's df) is at most this —
    * prefixes can then land on tokens shared by few docs. Counts are
    * post-sampling ([[Binning.MaxProbeBytes]] caps the probe), so
    * the threshold is stable in absolute terms at any corpus size. */
  val MaxRareDf = 32.0
  private val ZeroRank = "000000"
  private val Sep = "\u0001"

  /** token → rank∥SEP∥token under a hot-rank map literal. Injective
    * (fixed-width rank, token appended verbatim), and UTF8String's
    * byte-wise compare makes lexicographic-on-encodings ≡ (rank,
    * token) order — shared by the prefix sort, the join keys, and
    * the canonical array_min. */
  private def encodeExpr(mapLit: Expression, x: Expression): Expression =
    Concat(Seq(
      Coalesce(Seq(GetMapValue(mapLit, x), Literal(ZeroRank))),
      Literal(Sep), x))

  private def encodeArray(mapLit: Expression, arr: Expression): Expression = {
    val lv = NamedLambdaVariable("t", StringType, nullable = false)
    ArrayTransform(arr, LambdaFunction(encodeExpr(mapLit, lv), Seq(lv)))
  }

  // Probe cache — canonicalized (left, la, right, ra) → hot-rank map
  // (None = stay lexicographic). Perf-only staleness, see scaladoc.
  private val orderCache =
    new java.util.concurrent.ConcurrentHashMap[
      (LogicalPlan, Expression, LogicalPlan, Expression),
      Option[Literal]]()

  private val probeLog =
    org.slf4j.LoggerFactory.getLogger("graft.plans.OverlapJoinBlocking")

  /** The token-df probe (see scaladoc): Some(hot-rank map literal)
    * when the vocabulary is skewed enough for the df order to pay,
    * None for lexicographic. Conservative on every failure path. */
  private def tokenDfOrder(left: LogicalPlan, la: Expression,
      right: LogicalPlan, ra: Expression): Option[Literal] = {
    if (left.isStreaming || right.isStreaming) return None
    val key = (left.canonicalized, la.canonicalized,
      right.canonicalized, ra.canonicalized)
    val hit = orderCache.get(key)
    if (hit != null) return hit
    val computed: Option[Literal] =
      try {
        val spark = SparkSession.active
        def toks(side: LogicalPlan, arr: Expression)
            : org.apache.spark.sql.DataFrame = {
          val bytes = side.stats.sizeInBytes
          val probeSide =
            if (bytes <= Binning.MaxProbeBytes) side
            else Sample(0.0,
              (BigDecimal(Binning.MaxProbeBytes) / BigDecimal(bytes)).toDouble,
              withReplacement = false, 42L, side)
          Binning.dataFrameOf(spark,
            Project(Seq(Alias(arr, "__graft_toks")()), probeSide))
            .select(org.apache.spark.sql.functions.explode(
              org.apache.spark.sql.functions.array_distinct(
                org.apache.spark.sql.functions.col("__graft_toks"))).as("tok"))
        }
        import org.apache.spark.sql.functions.{col => c, count, lit}
        val hot = toks(left, la).unionAll(toks(right, ra))
          .groupBy("tok").agg(count(lit(1)).as("df"))
          .orderBy(c("df").desc, c("tok"))
          .limit(HotK + 1)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        if (hot.length < 2) None
        else {
          val top = hot.head._2.toDouble
          // With vocab > HotK this is the (K+1)-th df — an upper
          // bound on every tail df; with vocab <= HotK it is the
          // global minimum. Either way top/floor understates no skew.
          val floor = math.max(hot.last._2.toDouble, 1.0)
          if (top < SkewGate * floor || floor > MaxRareDf) {
            // Two ways the reorder cannot pay: a near-uniform
            // vocabulary (no skew to exploit), or a DENSE one whose
            // "rarest" token still lands in hundreds of docs — the
            // rare-first prefix then concentrates candidates into
            // buckets of size floor-df while the encoding taxes
            // every row (the sf0.1 synthetic corpus: 31 hot tokens,
            // floor 500 → 3× slower df-ordered). AllPairs' win needs
            // a genuinely rare tail; floor bounds every tail df from
            // above (exactly for vocab ≤ HotK, as the (K+1)-th df
            // otherwise), so floor ≤ MaxRareDf is the existence
            // certificate.
            probeLog.info(s"graft overlap df probe: no rare tail " +
              s"(top=$top floor=$floor), keeping lexicographic order")
            None
          } else {
            val ranks = hot.take(HotK)
              .sortBy { case (tok, d) => (d, tok) }.zipWithIndex
              .map { case ((tok, _), i) => tok -> f"${i + 1}%06d" }.toMap
            probeLog.info(s"graft overlap df probe: skewed " +
              s"(top=$top floor=$floor), df-ordering ${ranks.size} " +
              "hot tokens rare-first")
            Some(Literal.create(ranks,
              MapType(StringType, StringType, valueContainsNull = false)))
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          probeLog.warn(s"graft overlap df probe failed, keeping " +
            s"lexicographic order: $e")
          None
      }
    if (orderCache.size() > 64) orderCache.clear()
    orderCache.put(key, computed)
    computed
  }

  /** `size(array_intersect(..))`, bare or under the LONG cast the
    * analyzer inserts when the threshold literal is BIGINT. */
  private object SizeOfIntersect {
    def unapply(e: Expression): Option[ArrayIntersect] = e match {
      case Size(ai: ArrayIntersect, _) => Some(ai)
      case Cast(Size(ai: ArrayIntersect, _), LongType, _, _) => Some(ai)
      case _ => None
    }
  }

  /** An INT-range integral literal, either type. */
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(t: Int, IntegerType) => Some(t)
      case Literal(t: Long, LongType)
          if t >= Int.MinValue && t <= Int.MaxValue => Some(t.toInt)
      case _ => None
    }
  }

  /** overlap ≥ T in its literal spellings; returns (intersect, T ≥ 1). */
  private def overlapPredicate(e: Expression)
      : Option[(ArrayIntersect, Int)] = e match {
    case GreaterThanOrEqual(SizeOfIntersect(ai), IntLit(t)) if t >= 1 =>
      Some((ai, t))
    case GreaterThan(SizeOfIntersect(ai), IntLit(t)) if t >= 0 =>
      Some((ai, t + 1))
    case LessThanOrEqual(IntLit(t), SizeOfIntersect(ai)) if t >= 1 =>
      Some((ai, t))
    case LessThan(IntLit(t), SizeOfIntersect(ai)) if t >= 0 =>
      Some((ai, t + 1))
    case _ => None
  }

  /** First |distinct(s)| − T + 1 tokens of the sorted distinct set
    * (empty when |distinct(s)| < T — slice length clamps to 0) —
    * sorted by the df ENCODING when `ord` carries a hot-rank map,
    * plain lexicographic otherwise. */
  private def prefixExpr(s: Expression, t: Int,
      ord: Option[Literal]): Expression = {
    val base = ArrayDistinct(s)
    val keyed = ord.fold(base: Expression)(m => encodeArray(m, base))
    val sorted = SortArray(keyed, Literal(true))
    Slice(sorted, Literal(1),
      Greatest(Seq(Subtract(Size(sorted), Literal(t - 1)), Literal(0))))
  }

  /** Explode the prefix over `child`; the prefix column itself is
    * dropped from the Generate output (canonicalization reads the
    * post-join shared intersect instead), so only the token key rides
    * the blocked shuffle. */
  private def explodePrefix(child: LogicalPlan, s: Expression, t: Int,
      ord: Option[Literal]): (LogicalPlan, Attribute) = {
    val pfx = Alias(prefixExpr(s, t, ord), "__graft_pfx")()
    val proj = Project(child.output :+ pfx, child)
    val ok = AttributeReference(OkName, StringType, nullable = true)()
    val gen = Generate(Explode(pfx.toAttribute),
      unrequiredChildIndex = Seq(child.output.size),
      outer = false, qualifier = None, generatorOutput = Seq(ok), child = proj)
    (gen, ok)
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

  private def subst(e: Expression, ai: ArrayIntersect,
      shared: Attribute): Expression = e.transform {
    case x: ArrayIntersect if x.semanticEquals(ai) => shared
  }

  /** Rewrite `j` if it is in scope; returns the verify Filter (its
    * output = L.out ++ ok ++ R.out ++ ok ++ __shared — callers strip
    * or substitute), the shared-intersect attribute, and the matched
    * intersect expression for parent-level substitution. */
  private def tryRewrite(j: Join): Option[(LogicalPlan, Attribute,
      ArrayIntersect)] = j match {
    case Join(left, right, Inner, Some(cond), _)
        if cond.deterministic
          && !left.output.exists(_.name == OkName)
          && !right.output.exists(_.name == OkName)
          && !hasEquiKey(cond, left, right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit: Option[(ArrayIntersect, Expression, Expression, Int)] =
        conjuncts.iterator.flatMap { p =>
          overlapPredicate(p).flatMap { case (ai, t) =>
            if (!nullFreeStringArray(ai.left)
                || !nullFreeStringArray(ai.right)) None
            else if (ai.left.references.subsetOf(left.outputSet)
                && ai.right.references.subsetOf(right.outputSet))
              Some((ai, ai.left, ai.right, t))
            else if (ai.right.references.subsetOf(left.outputSet)
                && ai.left.references.subsetOf(right.outputSet))
              Some((ai, ai.right, ai.left, t))
            else None
          }
        }.take(1).toList.headOption
      hit.map { case (ai, la, ra, t) =>
        val ord = tokenDfOrder(left, la, right, ra)
        val (lgen, lk) = explodePrefix(left, la, t, ord)
        val (rgen, rk) = explodePrefix(right, ra, t, ord)
        // Conjuncts never touching the matched intersect prune inside
        // the join, BEFORE the per-candidate set build is paid; the
        // rest re-applies above, reading the shared alias.
        val (needShared, rest) = conjuncts.partition(_.exists {
          case x: ArrayIntersect => x.semanticEquals(ai)
          case _ => false
        })
        val blockedCond = (EqualTo(lk, rk) +: rest).reduce(And)
        val blocked = Join(lgen, rgen, Inner, Some(blockedCond),
          JoinHint.NONE)
        val shared = Alias(ai, SharedName)()
        val proj = Project(blocked.output :+ shared, blocked)
        val verify = needShared.map(subst(_, ai, shared.toAttribute))
          .reduce(And)
        // The canonical comparison must run in the SAME order the
        // prefixes were built in: min of the encoded shared intersect
        // under the df order, plain array_min otherwise (the
        // soundness argument in the class doc is order-generic).
        val canonical = EqualTo(lk,
          ArrayMin(ord.fold(shared.toAttribute: Expression)(m =>
            encodeArray(m, shared.toAttribute))))
        (Filter(And(verify, canonical), proj), shared.toAttribute, ai)
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // A Project/Aggregate sitting directly on the join gets its own
    // copies of the intersect (the `n_shared` output shape) pointed at
    // the shared alias — the whole operator then builds the set once.
    case p @ Project(projList, j: Join) =>
      tryRewrite(j) match {
        case None => p
        case Some((filtered, shared, ai)) =>
          Project(projList.map(e =>
            subst(e, ai, shared).asInstanceOf[NamedExpression]), filtered)
      }
    case a: Aggregate if a.child.isInstanceOf[Join] =>
      tryRewrite(a.child.asInstanceOf[Join]) match {
        case None => a
        case Some((filtered, shared, ai)) =>
          a.copy(
            groupingExpressions =
              a.groupingExpressions.map(subst(_, ai, shared)),
            aggregateExpressions = a.aggregateExpressions.map(e =>
              subst(e, ai, shared).asInstanceOf[NamedExpression]),
            child = filtered)
      }
    case j: Join =>
      tryRewrite(j) match {
        case None => j
        case Some((filtered, _, _)) => Project(j.output, filtered)
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
