package graft.plans

import graft.functions.{CosineSim, HyperplaneSignature}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: plan `JOIN ... ON cosine_sim(a, b) >= t` (the
  * embedding near-duplicate predicate) as a HYPERPLANE-SIGNATURE
  * banded equi-join instead of the quadratic nested loop it otherwise
  * becomes — the seventh member of the declarative-scale rule family
  * ([[FuzzyJoinBlocking]] edit distance, [[HammingBandJoin]] Hamming
  * radius, [[OverlapJoinBlocking]] absolute/relative set overlap,
  * [[RangeBinJoin]]/[[IntervalOverlapJoin]] range/interval theta).
  *
  * A cosine-threshold condition has no equi keys, so join selection
  * falls to BroadcastNestedLoopJoin — |L|·|R| 64-float dot products
  * that cannot hash-partition. The rewrite is the [[HammingBandJoin]]
  * treatment carried into embedding space, the same blocking the
  * imperative q_embed_dup operator applies by hand: quantize each
  * vector to the engine's 16-bit random-hyperplane signature
  * ([[HyperplaneSignature]], one codegen'd pass over the 64 floats),
  * split the signature into [[NumBands]] = 4 disjoint 4-bit bands by
  * default — both knobs are session confs ([[PlanesKey]] up to 64
  * planes in the Long signature, [[BandsKey]] up to one band per
  * plane), so a deployment sizes selectivity and the certified
  * radius to its corpus without a plan-shape change —
  * equi-join on (band index, band value), re-apply the ORIGINAL
  * condition as the exact verify, and keep exactly one copy per pair
  * with the first-matching-band canonical filter (recomputed from
  * both signature columns — multiplicity preserved with no distinct
  * shuffle):
  *
  *   Project(L.out ++ R.out,
  *     Filter(originalCondition AND lband.i = firstMatchingBand(sa, sb),
  *       Join(explode(bands(sa)) over L+sa, explode(bands(sb)) over R+sb,
  *            Inner, lband = rband [AND rest])))
  *
  * Cheap residual conjuncts (`vec_a < vec_b` and friends) ride inside
  * the blocked join's condition, pruning before the verify.
  *
  * == The recall contract (what "exact" means here) ==
  *
  * Unlike the six exact siblings, LSH banding is candidate-COMPLETE
  * only relative to the quantized signatures: the pigeonhole argument
  * guarantees every pair whose 16-bit signatures differ in at most
  * [[NumBands]] − 1 = 3 bits shares an identical band — for THAT
  * radius the rewrite is exact, and the verify keeps precision exact
  * always (no false pairs, ever). A t-qualifying pair whose
  * signatures disagree in ≥ 4 of 16 planes is outside the blocking
  * radius and is missed — the standard LSH near-duplicate contract
  * (the one every embedding-dedup pipeline that bands signatures
  * ships, and exactly the discipline q_dedup_simhash documents for
  * text): at angle θ a plane flips with probability θ/π, so the
  * contract degrades gracefully as t leaves the near-duplicate
  * regime. Hence the scope guard t ∈ (0, 1]: at t ≤ 0 the predicate
  * admits near-orthogonal pairs whose signatures disagree on ~half
  * the planes — banding would be silently lossy with no compensating
  * regime, so the join passes through unrewritten. CosineRuleSpec
  * pins equality with the un-rewritten plan on a planted
  * perturbation corpus (signature distance verified ≤ the radius),
  * the NestedLoop-free shape, the passthrough guards, and the
  * kill-switch conf [[EnabledKey]] for users who want the nested
  * loop's unconditional semantics back.
  *
  * [[HyperplaneSignature]] fails loudly (a descriptive
  * IllegalArgumentException) on embeddings that are not 64-dim — the
  * engine's embedding layout contract — rather than degrading to a
  * silent wrong answer.
  *
  * Cost: ×bands map-side rows per input and one band-keyed shuffle
  * vs an |L|·|R| nested loop; the 16/4 demo geometry yields 16
  * values per band, and real deployments raise [[PlanesKey]] /
  * [[BandsKey]] to the corpus — the plan shape is unchanged
  * (CosineRuleSpec pins a 32-plane / 8-band session against brute
  * force).
  */
object CosineBandJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val BandName = "__graft_cband"
  private val BandsName = "__graft_cbands"
  private val SigName = "__graft_csig"

  val NumPlanes = 16
  val NumBands = 4

  /** Session kill-switch: set to "false" to always keep the nested
    * loop's unconditional semantics. */
  val EnabledKey = "spark.graft.cosine_band_join.enabled"

  /** Geometry confs — the "plane count sizes to the corpus" claim
    * made literal: a 100 TB deployment raises the signature width
    * (up to [[graft.functions.HyperSig.MaxPlanes]] = 64 — a LongType
    * signature) and the band count to tune selectivity vs the
    * certified radius (bands − 1 signature bits). Invalid or
    * out-of-range values fall back to the 16/4 demo defaults. */
  val PlanesKey = "spark.graft.cosine_band_join.planes"
  val BandsKey = "spark.graft.cosine_band_join.bands"

  private final case class Geometry(planes: Int, bands: Int) {
    val bandBits: Int = (planes + bands - 1) / bands
    val mask: Long = (1L << bandBits) - 1
  }

  private def confInt(key: String, dflt: Int): Int =
    try SQLConf.get.getConfString(key, dflt.toString).toInt
    catch { case _: Throwable => dflt }

  private def geometry: Geometry = {
    val p = confInt(PlanesKey, NumPlanes)
    val b = confInt(BandsKey, NumBands)
    val g = Geometry(p, b)
    // Scope: planes fit a Long signature, at least one band, and the
    // last band's shift stays below 64 (Java shifts are mod-64) — a
    // band window past the plane count reads guaranteed-zero bits,
    // which is complete (always-equal band) but must not WRAP.
    if (p >= 1 && p <= graft.functions.HyperSig.MaxPlanes
        && b >= 1 && b <= p && (b - 1) * g.bandBits <= 63) g
    else Geometry(NumPlanes, NumBands)
  }

  private def enabled: Boolean =
    try SQLConf.get.getConfString(EnabledKey, "true").toBoolean
    catch { case _: Throwable => true }

  /** t ∈ (0, 1] as a fractional literal (double, float or decimal —
    * the SQL spelling `0.9` parses as decimal and reaches the join
    * under a double cast when folding has not collapsed it yet). */
  private object ThresholdLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Cast(inner, DoubleType, _, _) => unapply(inner)
      case Literal(v: Double, DoubleType) => Some(v)
      case Literal(v: Float, FloatType) => Some(v.toDouble)
      case l @ Literal(v, _: DecimalType) if v != null =>
        Some(l.value.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case _ => None
    }
  }

  // ---- the spelled-out dot/norm form ------------------------------
  // Users without the engine's cosine_sim write the composed HOF
  // cosine:   aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)
  //         / (sqrt(aggregate(transform(a, x -> x*x), 0d, +)) *
  //            sqrt(aggregate(transform(b, x -> x*x), 0d, +)))
  // (with or without per-element double casts). The matchers below
  // recognize exactly that shape — the verify always re-applies the
  // ORIGINAL predicate, so the match only needs to extract (a, b)
  // for blocking, never to re-derive the arithmetic.

  private def sameVar(e: Expression, v: NamedExpression): Boolean =
    (stripDoubleCast(e), v) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        x.exprId == y.exprId
      case _ => false
    }

  private def stripDoubleCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripDoubleCast(c)
    case _ => e
  }

  /** merge = (acc, x) -> acc + x over its own two lambda vars. */
  private def isPlainSum(merge: Expression, finish: Expression): Boolean =
    (merge, finish) match {
      case (LambdaFunction(Add(l, r, _), Seq(acc, x), _),
          LambdaFunction(fb, Seq(facc), _)) =>
        ((sameVar(l, acc) && sameVar(r, x)) ||
          (sameVar(l, x) && sameVar(r, acc))) && sameVar(fb, facc)
      case _ => false
    }

  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(x, y, _), Seq(xv, yv), _)),
          Literal(0.0, DoubleType), merge, finish)
          if isPlainSum(merge, finish)
            && ((sameVar(x, xv) && sameVar(y, yv))
              || (sameVar(x, yv) && sameVar(y, xv))) =>
        Some((a, b))
      case _ => None
    }
  }

  private object NormOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
          ArrayTransform(a, LambdaFunction(Multiply(x, y, _), Seq(v), _)),
          Literal(0.0, DoubleType), merge, finish))
          if isPlainSum(merge, finish) && sameVar(x, v) && sameVar(y, v) =>
        Some(a)
      case _ => None
    }
  }

  /** dot(a,b) / (norm(a) * norm(b)) — norms over the same pair,
    * either order. */
  private object SpelledCosine {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Divide(DotFold(a, b), Multiply(NormOf(x), NormOf(y), _), _)
          if (x.semanticEquals(a) && y.semanticEquals(b)) ||
            (x.semanticEquals(b) && y.semanticEquals(a)) =>
        Some((a, b))
      case _ => None
    }
  }

  private object CosineOf {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case c: CosineSim => Some((c.left, c.right))
      case SpelledCosine(a, b) => Some((a, b))
      case _ => None
    }
  }

  /** cosine >= t in its literal spellings — the engine's fused
    * cosine_sim or the spelled-out dot/norm composition. */
  private def cosinePredicate(e: Expression)
      : Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(CosineOf(a, b), ThresholdLit(t))
        if t > 0 && t <= 1 => Some((a, b))
    case GreaterThan(CosineOf(a, b), ThresholdLit(t))
        if t > 0 && t <= 1 => Some((a, b))
    case LessThanOrEqual(ThresholdLit(t), CosineOf(a, b))
        if t > 0 && t <= 1 => Some((a, b))
    case LessThan(ThresholdLit(t), CosineOf(a, b))
        if t > 0 && t <= 1 => Some((a, b))
    case _ => None
  }

  private def bandOf(g: Geometry, sig: Expression,
      shift: Expression): Expression =
    BitwiseAnd(ShiftRightUnsigned(sig, shift), Literal(g.mask))

  /** Project the signature once per row, then explode its bands. */
  private def explodeBands(g: Geometry, child: LogicalPlan, vec: Expression)
      : (LogicalPlan, Attribute, Attribute) = {
    val sig = Alias(HyperplaneSignature(vec, g.planes), SigName)()
    val structs = (0 until g.bands).map { i =>
      CreateNamedStruct(Seq(Literal("i"), Literal(i),
        Literal("v"), bandOf(g, sig.toAttribute, Literal(i * g.bandBits))))
    }
    val proj1 = Project(child.output :+ sig, child)
    val ks = Alias(CreateArray(structs), BandsName)()
    val proj2 = Project(proj1.output :+ ks, proj1)
    val band = AttributeReference(BandName,
      StructType(Seq(StructField("i", IntegerType, nullable = false),
        StructField("v", LongType, nullable = true))),
      nullable = true)()
    val gen = Generate(Explode(ks.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(band),
      child = proj2)
    (gen, band, sig.toAttribute)
  }

  /** The smallest band index on which the two signatures agree —
    * recomputed from both signature columns, so filtering the
    * exploded join on it keeps exactly one copy of each pair. */
  private def firstMatchingBand(g: Geometry, sa: Expression,
      sb: Expression): Expression = {
    val i = NamedLambdaVariable("i", IntegerType, nullable = false)
    val eq = EqualTo(bandOf(g, sa, Multiply(i, Literal(g.bandBits))),
      bandOf(g, sb, Multiply(i, Literal(g.bandBits))))
    ArrayMin(ArrayFilter(
      new Sequence(Literal(0), Literal(g.bands - 1), None,
        Some(SQLConf.get.sessionLocalTimeZone)),
      LambdaFunction(eq, Seq(i))))
  }

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

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if cond.deterministic
            && !left.output.exists(_.name == BandName)
            && !right.output.exists(_.name == BandName)
            && !hasEquiKey(cond, left, right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        def floatArray(e: Expression): Boolean = e.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        }
        val hit: Option[(Expression, Expression)] =
          conjuncts.iterator.flatMap { p =>
            cosinePredicate(p).flatMap { case (x, y) =>
              // The fused cosine_sim enforces array<float> itself;
              // the spelled dot/norm form needs the explicit guard
              // (hypersig's signature contract is float embeddings).
              if (!floatArray(x) || !floatArray(y)) None
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
            val g = geometry
            val (lgen, lband, lsig) = explodeBands(g, left, a)
            val (rgen, rband, rsig) = explodeBands(g, right, b)
            // Conjuncts not touching the cosine prune inside the
            // blocked join, before the verify pays the dot product.
            val (needCos, rest) = conjuncts.partition(_.exists {
              case _: CosineSim => true
              case _ => false
            })
            val blockedCond =
              (EqualTo(lband, rband) +: rest).reduce(And)
            val blocked = Join(lgen, rgen, Inner, Some(blockedCond),
              JoinHint.NONE)
            val canonical = EqualTo(
              GetStructField(lband, 0, Some("i")),
              firstMatchingBand(g, lsig, rsig))
            val verify = (needCos :+ canonical).reduce(And)
            Project(j.output, Filter(verify, blocked))
        }
    }

  /** In-code seam for an already-built session (the spark-submit-time
    * seam is `--conf spark.sql.extensions=graft.GraftExtensions`).
    * Idempotent. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(CosineBandJoin)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ CosineBandJoin
    }
}
