package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project, Sample}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation, PartitioningAwareFileIndex}
import org.apache.spark.sql.functions.{col, count, lit, max, percentile_approx, sum, when}
import org.apache.spark.sql.types.DoubleType

import scala.util.control.NonFatal

/** Shared machinery for the two bin-blocking rules ([[RangeBinJoin]],
  * [[IntervalOverlapJoin]]): the per-row SAFE predicate that routes
  * interval rows between the binned equi-join and the exact residual
  * join, and the plan-time statistics pass that both derives the bin
  * width from the data's own interval lengths and decides whether the
  * residual branch needs to exist at all.
  *
  * == The safe predicate ==
  *
  * `abs(hi/G − lo/G) <= MaxSpanBuckets`, evaluated in double. Every
  * pathological value fails it the right way under Spark's NaN-largest
  * comparison semantics: a NaN bound makes the subtraction NaN (NaN ≤
  * cap is FALSE), an infinite bound makes it ±Inf or NaN (FALSE), a
  * finite-but-enormous span (the SCD2 end-of-time sentinel, an
  * epoch-µs interval against a seconds-tuned width) exceeds the cap
  * (FALSE), and a NULL bound nulls the whole predicate — which is
  * CORRECT to drop from BOTH paths, because a null bound can never
  * satisfy the original inequality conjuncts of an inner join. Safe
  * rows explode into at most MaxSpanBuckets+1 bucket keys; unsafe rows
  * take the residual join, where the ORIGINAL predicate evaluates
  * row-by-row — exact for every input, including the NaN/Inf bounds
  * that the pre-r10 rewrite silently mishandled.
  *
  * == The stats pass ==
  *
  * Candidate volume scales with rows-per-bucket² and fan-out with
  * interval-length/width, so the sweet spot tracks the typical
  * interval length. At rule-fire time [[sideStats]] takes ONE pass
  * over the interval side — a driver-side evaluation for an in-plan
  * [[LocalRelation]] (VALUES lists, literal band tables), a single
  * column-pruned aggregate job for anything else — producing the
  * median |hi−lo|, the maximum FINITE |hi−lo|, and the count of
  * non-finite lengths. From those:
  *
  *  - the bin width is the median quantized to a power of two (so
  *    near-identical datasets get identical widths), falling back to
  *    the rule's static default when the sample is empty/degenerate.
  *    Any positive width is CORRECT — the floor-division binning
  *    identity is monotone — the width only tunes candidate volume.
  *  - the residual branch is emitted ONLY when unsafe rows provably
  *    can exist (a non-finite length, or a max finite length within
  *    two buckets of the cap). Clean data — the overwhelmingly common
  *    case — gets a plan with no residual at all, because runtime
  *    can't prune it for us: AQE does not propagate empty relations
  *    through broadcast stages, so an always-emitted residual would
  *    cost a full scan of the big side per query even when empty.
  *
  * Any probe failure (no active session, a removed-in-future API)
  * degrades conservatively: fallback width, residual branch ON —
  * never a correctness change. A STREAMING interval side never runs
  * a probe job at all — it short-circuits to the same conservative
  * answer before touching the session (BinningProbeSpec pins the
  * no-job path). Interval sides too large to scan at plan time
  * ([[MaxProbeBytes]]) probe a SAMPLE for the width (any width is
  * correct — it only tunes candidate volume) while the residual
  * decision stays conservative (a sample cannot prove the absence of
  * unsafe rows), so plan latency is bounded on arbitrarily large
  * inputs. Every probe logs its outcome (rows scanned, median, and
  * failure cause on the degradation path).
  *
  * Results are cached per canonicalized (side, lo, hi) PLUS a
  * data-version fingerprint, so re-planning the same query never
  * re-scans — and a side whose underlying files changed (append,
  * overwrite) misses the cache and re-derives, because the residual
  * decision is CORRECTNESS-bearing: serving a stale
  * nonFiniteOrUnknown = 0 for data that has since gained a NaN/Inf
  * bound would omit the residual branch and mis-bin those rows. The
  * fingerprint covers exactly the leaf shapes whose data version is
  * knowable (LocalRelation — its rows live inside the canonicalized
  * key itself — and file-source relations via root paths + size + a
  * per-file (name, length, mtime) digest, which an overwrite always
  * perturbs because part-file names are randomized per write);
  * anything else is never cached.
  */
private[plans] object Binning {

  /** Marker-name prefix shared by every blocking rule's emitted
    * columns; a join touching ANY such column is rule output and must
    * never be re-blocked (by the same rule or a sibling — the
    * residual join's condition is still a textbook range sandwich). */
  val MarkerPrefix = "__graft_"

  /** Max exploded buckets per interval row on the binned path. */
  val MaxSpanBuckets = 256

  /** Row cap for the driver-side LocalRelation evaluation. */
  val LocalRows = 100000

  def hasMarker(plan: LogicalPlan): Boolean =
    plan.output.exists(_.name.startsWith(MarkerPrefix))

  /** The per-row routing predicate (see scaladoc). */
  def safeSpan(lo: Expression, hi: Expression, width: Double): Expression = {
    val g = Literal(width)
    LessThanOrEqual(
      Abs(Subtract(Divide(Cast(hi, DoubleType), g),
        Divide(Cast(lo, DoubleType), g))),
      Literal(MaxSpanBuckets.toDouble))
  }

  /** One interval side's plan-time statistics. `None` medians mean
    * "no finite lengths seen"; `nonFiniteOrUnknown` is conservative —
    * any probe failure reports it as positive. */
  final case class SideStats(median: Option[Double],
      maxFinite: Option[Double], nonFiniteOrUnknown: Long)

  private val Unknown = SideStats(None, None, 1L)

  /** Width from the stats: median quantized to a power of two, else
    * the rule's fallback. */
  def widthOf(stats: SideStats, fallback: Double): Double = stats.median match {
    case Some(len) if len > 0 && java.lang.Double.isFinite(len) =>
      math.pow(2.0, math.round(math.log(len) / math.log(2.0)).toDouble)
    case _ => fallback
  }

  /** Whether any row of the side could fail [[safeSpan]] at `width` —
    * if false, the residual branch is provably unnecessary (the two-
    * bucket margin absorbs IEEE rounding between |hi−lo|/G and
    * hi/G−lo/G). */
  def unsafePossible(stats: SideStats, width: Double): Boolean =
    stats.nonFiniteOrUnknown > 0 ||
      stats.maxFinite.exists(_ / width > (MaxSpanBuckets - 2).toDouble)

  private val log = org.slf4j.LoggerFactory.getLogger("graft.plans.Binning")

  /** Byte budget for the plan-time probe job: a larger interval side
    * probes a deterministic SAMPLE sized to this budget instead (width
    * stays data-derived; the residual decision degrades to
    * conservative because a sample proves nothing about absence), so
    * planning latency is bounded however large the side is. */
  val MaxProbeBytes: Long = 32L << 30

  // Stats cache, keyed by the canonicalized (side, lo, hi) triple PLUS
  // a data-version fingerprint (see the class doc: staleness of
  // unsafePossible is correctness-bearing, so a key must change
  // whenever the data can have). Leaves without a knowable version are
  // never cached. The size bound stops unbounded growth in long-lived
  // sessions; losing an entry only re-runs a probe.
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[
      (LogicalPlan, Expression, Expression, String), SideStats]()

  /** A string that changes whenever `plan`'s underlying DATA can have
    * changed; `None` when a leaf's data version is unknowable (then
    * the caller must not cache). LocalRelation rows are part of the
    * canonicalized plan itself, so a constant suffices; file sources
    * fingerprint as root paths + total size + an order-insensitive
    * digest of every file's (name, length, mtime) (the listing is
    * already cached on the FileIndex — no extra I/O). Per-FILE names
    * and sizes matter, not just count + max mtime: an overwrite that
    * preserves total size and file count can land inside a coarse
    * filesystem's mtime granularity window, but part-file names are
    * freshly randomized per write, so the per-file digest still
    * changes — and staleness here is correctness-bearing (a stale
    * nonFiniteOrUnknown = 0 omits the residual branch). */
  private[plans] def dataFingerprint(plan: LogicalPlan): Option[String] = {
    val parts = plan.collectLeaves().map {
      case _: LocalRelation => Some("local")
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          try {
            val loc = fs.location
            val files = loc match {
              case p: PartitioningAwareFileIndex =>
                val md = java.security.MessageDigest.getInstance("MD5")
                // XOR of per-file digests: order-insensitive without
                // sorting the (possibly large) listing.
                val acc = new Array[Byte](16)
                var n = 0
                p.allFiles().foreach { f =>
                  val d = md.digest(
                    s"${f.getPath}:${f.getLen}:${f.getModificationTime}"
                      .getBytes("UTF-8"))
                  var i = 0
                  while (i < 16) { acc(i) = (acc(i) ^ d(i)).toByte; i += 1 }
                  md.reset()
                  n += 1
                }
                s"$n:${acc.map("%02x".format(_)).mkString}"
              case _ =>
                // Digest the listing rather than embedding it: the
                // cache key must stay O(16 bytes) even for relations
                // with very large file listings.
                val md = java.security.MessageDigest.getInstance("MD5")
                val names = loc.inputFiles.sorted
                names.foreach(f => md.update(f.getBytes("UTF-8")))
                s"${names.length}:${md.digest().map("%02x".format(_)).mkString}"
            }
            Some(s"fs:${loc.rootPaths.mkString(",")}:${loc.sizeInBytes}:$files")
          } catch { case NonFatal(_) => None }
        case _ => None
      }
      case _ => None
    }
    if (parts.nonEmpty && parts.forall(_.isDefined))
      Some(parts.flatten.mkString("|"))
    else None
  }

  def sideStats(child: LogicalPlan, lo: Expression,
      hi: Expression): SideStats =
    dataFingerprint(child) match {
      case None =>
        // Unknown data version: never cache — recompute per rule fire
        // (streaming children short-circuit inside computeStats).
        computeStats(child, lo, hi)
      case Some(fp) =>
        val key = (child.canonicalized, lo.canonicalized, hi.canonicalized, fp)
        val hit = statsCache.get(key)
        if (hit != null) hit
        else {
          val stats = computeStats(child, lo, hi)
          if (statsCache.size() > 64) statsCache.clear()
          statsCache.put(key, stats)
          stats
        }
    }

  private def computeStats(child: LogicalPlan, lo: Expression,
      hi: Expression): SideStats = {
    val len = Abs(Subtract(Cast(hi, DoubleType), Cast(lo, DoubleType)))
    child match {
      case lr: LocalRelation if lr.data.length <= LocalRows =>
        try {
          val bound = BindReferences.bindReference(len, lr.output)
          var nonFinite = 0L
          val finite = Array.newBuilder[Double]
          lr.data.foreach(r => bound.eval(r) match {
            case d: java.lang.Double =>
              if (java.lang.Double.isFinite(d.doubleValue()))
                finite += d.doubleValue()
              else nonFinite += 1
            case null => () // null bounds match nothing on either path
            case _ => nonFinite += 1
          })
          val vals = finite.result().sorted
          SideStats(
            if (vals.isEmpty) None else Some(vals(vals.length / 2)),
            if (vals.isEmpty) None else Some(vals.last),
            nonFinite)
        } catch {
          case NonFatal(e) =>
            log.warn(s"graft binning local probe failed, degrading to " +
              s"fallback width + residual: $e")
            Unknown
        }
      case s if s.isStreaming =>
        // A probe job over a streaming source is both impossible
        // (unbounded) and wrong to attempt at plan time; degrade
        // WITHOUT touching the session (BinningProbeSpec pins that no
        // job starts on this path).
        log.info("graft binning probe skipped for streaming side: " +
          "fallback width, residual ON")
        Unknown
      case _ =>
        try {
          val spark = SparkSession.active
          // Bound plan-time work: past the byte budget, probe a
          // deterministic sample — the width stays data-derived, and
          // the forced nonFiniteOrUnknown keeps the residual decision
          // conservative (a sample cannot prove clean data).
          val bytes = child.stats.sizeInBytes
          val sampled = bytes > MaxProbeBytes
          val probeChild =
            if (!sampled) child
            else Sample(0.0,
              (BigDecimal(MaxProbeBytes) / BigDecimal(bytes)).toDouble,
              withReplacement = false, 42L, child)
          val lens = dataFrameOf(spark,
            Project(Seq(Alias(len, "__graft_len")()), probeChild))
          // `l <= MaxValue` is FALSE for NaN and +Inf under Spark's
          // NaN-greatest ordering, so `fin` nulls every non-finite
          // length and `nf` counts exactly those.
          val l = col("__graft_len")
          val fin = when(l >= lit(0.0) && l <= lit(Double.MaxValue), l)
          val nf = when(l.isNotNull
            && !(l >= lit(0.0) && l <= lit(Double.MaxValue)), lit(1L))
            .otherwise(lit(0L))
          val row = lens.agg(
            percentile_approx(fin, lit(0.5), lit(1000)),
            max(fin), sum(nf), count(lit(1))).head()
          val nonFinite = (if (row.isNullAt(2)) 0L else row.getLong(2)) +
            (if (sampled) 1L else 0L)
          val st = SideStats(
            if (row.isNullAt(0)) None else Some(row.getDouble(0)),
            if (row.isNullAt(1)) None else Some(row.getDouble(1)),
            nonFinite)
          log.info(s"graft binning probe: rows=${row.getLong(3)} " +
            s"sampled=$sampled median=${st.median} " +
            s"maxFinite=${st.maxFinite} " +
            s"nonFiniteOrUnknown=${st.nonFiniteOrUnknown}")
          st
        } catch {
          case NonFatal(e) =>
            log.warn(s"graft binning probe failed, degrading to " +
              s"fallback width + residual: $e")
            Unknown
        }
    }
  }

  /** `Dataset.ofRows` is private[sql], so the stats pass reaches it
    * reflectively (the object is stable public API in practice — AQE,
    * connectors, and every execution path construct frames this way).
    * Any signature drift lands in the caller's try/catch and degrades
    * to the conservative fallback. Shared with
    * [[OverlapJoinBlocking]]'s token-df probe. */
  private[plans] def dataFrameOf(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val cls = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val module = cls.getField("MODULE$").get(null)
    val m = cls.getMethods.find(m =>
      m.getName == "ofRows" && m.getParameterCount == 2).get
    m.invoke(module, spark, plan).asInstanceOf[DataFrame]
  }
}
