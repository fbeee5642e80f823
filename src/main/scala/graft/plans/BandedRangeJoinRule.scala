package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: plan a point-in-interval OR interval-overlap theta
  * join as a banded EQUI join, automatically.
  *
  * Spark has no native range-join strategy: an inner join whose only
  * usable predicate is `p >= lo AND p <= hi` falls back to
  * BroadcastNestedLoopJoin (one side must fit in memory) or a cartesian
  * product — both non-starters when both sides are fact-sized. The same
  * query shape the reference answers with its region model (which file
  * regions overlap this read range — RegionMask intersection,
  * reference core region model) must therefore be rewritten before it
  * reaches physical planning.
  *
  * Rewrite (the logical-plan form of JoinOps.bandedRangeJoin):
  *
  *   Join(P, I, p >= lo && p <= hi && rest)
  *   ==>
  *   Project(out,
  *     Join(Project(P, p_band = floor(p / w)),
  *          Generate(explode(sequence(floor(lo/w), floor(hi/w))), I) as i_band,
  *          p_band = i_band && p >= lo && p <= hi && rest))
  *
  * Every true (point, interval) pair meets in exactly the point's band —
  * each point carries ONE band, so no dedup is needed; the interval side
  * replicates ⌈span/w⌉+1 ≤ 2× when w is chosen at the typical span. The
  * join is then an ordinary shuffle hash/merge equi join that AQE can
  * skew-split, and it scales as one hash shuffle per side.
  *
  * Fires only when:
  *  - `spark.graft.rangeJoin.bandWidth` > 0 (off by default) for the
  *    point-in-interval rewrite; the interval-OVERLAP rewrite is gated
  *    by its own `spark.graft.rangeJoin.overlapBandWidth` (also off by
  *    default) because it matches ANY opposing pair of cross-side
  *    numeric inequalities — a width tuned for one join's units must
  *    not silently re-plan unrelated inequality joins in the session,
  *  - the join is INNER with a conjunct pair `p >= lo` / `p <= hi`
  *    (strict or not) where p is numeric from one side and lo/hi come
  *    from the other,
  *  - no equi-join conjunct exists already (if one does, Catalyst
  *    already plans a hash join and banding would only add work).
  *
  * Band arithmetic uses floor(x / w) in DOUBLE — exact for |x| < 2^52,
  * i.e. any day number, epoch second/milli, or byte offset; and floor
  * (not integer division) so negative coordinates band correctly.
  */
case class BandedRangeJoinRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.bandWidth"
  private val OverlapConfKey = "spark.graft.rangeJoin.overlapBandWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = spark.conf.get(ConfKey, "0").toLong
    val wOv = spark.conf.get(OverlapConfKey, "0").toLong
    if (w <= 0 && wOv <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        // point-in-interval first (cheaper: the point side projects one
        // band, no explode); the overlap rewrite catches the general
        // two-interval predicate under its own opt-in key
        (if (w > 0) rewrite(j, w) else None)
          .orElse(if (wOv > 0) rewriteOverlap(j, wOv) else None)
          .getOrElse(j)
    }
  }

  /** p belongs wholly to `side` (non-empty refs — rules out literals). */
  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  private def bandOfW(e: Expression, w: Long): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble)))

  /** explode(sequence(band(lo), max(band(lo), band(hi)))) with the
    * maxBands fail-fast guard — the banded fan-out both rewrites share. */
  private def bandExplode(lo: Expression, hi: Expression, w: Long): Explode = {
    val maxBands = spark.conf
      .get("spark.graft.rangeJoin.maxBands", "10000").toLong
    val lban = bandOfW(lo, w)
    val hban = Greatest(Seq(lban, bandOfW(hi, w)))
    val seq = Sequence(lban, hban, Some(Literal(1L)),
      Some(spark.sessionState.conf.sessionLocalTimeZone))
    val spanOk = LessThanOrEqual(Subtract(hban, lban), Literal(maxBands))
    val failure = new AssertTrue(spanOk,
      Literal("graft banded range join: interval spans more bands than " +
        "spark.graft.rangeJoin.maxBands — raise it or fix " +
        "spark.graft.rangeJoin.bandWidth to match this join's units")
    ).replacement // the runtime-replaced If(raise_error) — throws when evaluated
    // NULL bounds (e.g. from an outer-join-derived input) would make
    // spanOk NULL and fall through to the raise_error else-branch; in the
    // un-rewritten inner join such rows simply never match, so mirror
    // that: explode(NULL) emits zero rows for them.
    val boundsKnown = And(IsNotNull(lo), IsNotNull(hi))
    Explode(CaseWhen(
      Seq((And(boundsKnown, spanOk), seq),
        (Not(boundsKnown), Cast(Literal(null), seq.dataType))),
      Some(Cast(failure, seq.dataType))))
  }

  /** Any cross-side equi conjunct makes the join hash-plannable already —
    * banding would only add work. (EqualNullSafe is a hash key too.) */
  private def hasEquiKey(j: Join, conjuncts: Seq[Expression]): Boolean = {
    def crossSides(l: Expression, r: Expression): Boolean =
      (from(l, j.left) && from(r, j.right)) ||
        (from(l, j.right) && from(r, j.left))
    conjuncts.exists {
      case EqualTo(l, r)       => crossSides(l, r)
      case EqualNullSafe(l, r) => crossSides(l, r)
      case _                   => false
    }
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    if (hasEquiKey(j, conjuncts)) return None

    // find a lower bound `p >= lo` (or lo <= p / p > lo / lo < p) and an
    // upper bound `p <= hi` on the SAME point expression p
    def asLower(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case GreaterThan(p, lo)        => Some((p, lo))
      case LessThanOrEqual(lo, p)    => Some((p, lo))
      case LessThan(lo, p)           => Some((p, lo))
      case _                         => None
    }
    def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(p, hi)    => Some((p, hi))
      case LessThan(p, hi)           => Some((p, hi))
      case GreaterThanOrEqual(hi, p) => Some((p, hi))
      case GreaterThan(hi, p)        => Some((p, hi))
      case _                         => None
    }

    val candidates = for {
      lc <- conjuncts; (p1, lo) <- asLower(lc).toSeq
      uc <- conjuncts; (p2, hi) <- asUpper(uc).toSeq
      if p1.semanticEquals(p2)
      if p1.dataType.isInstanceOf[NumericType]
      if lo.dataType.isInstanceOf[NumericType] && hi.dataType.isInstanceOf[NumericType]
      // orient: point side vs interval side
      side <- {
        if (from(p1, j.left) && from(lo, j.right) && from(hi, j.right))
          Seq(true)   // point on left
        else if (from(p1, j.right) && from(lo, j.left) && from(hi, j.left))
          Seq(false)  // point on right
        else Seq.empty[Boolean]
      }
    } yield (p1, lo, hi, side)

    candidates.headOption.map { case (p, lo, hi, pointOnLeft) =>
      val (pointPlan, intervalPlan) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // point side: one extra projected column, its single band
      val pBand = Alias(bandOfW(p, w), "__p_band")()
      val pointProj = Project(pointPlan.output :+ pBand, pointPlan)

      // interval side: explode the (usually <= 2) bands the interval
      // spans. Sequence is TimeZoneAwareExpression (explicit zone or it
      // reports unresolved mid-optimizer); Greatest-clamped because
      // sequence(start, stop) THROWS when start > stop (empty interval →
      // one band, exact predicate rejects); maxBands fail-fast so a
      // bandWidth tuned for one join's units can't silently explode a
      // second join's shuffle (all inside bandExplode)
      val iBandAttr = AttributeReference("__i_band", LongType, nullable = true)()
      val intervalGen = Generate(bandExplode(lo, hi, w),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBandAttr), child = intervalPlan)

      val newCond = (EqualTo(pBand.toAttribute, iBandAttr) +: conjuncts)
        .reduce(And.apply)
      val (newLeft, newRight) =
        if (pointOnLeft) (pointProj, intervalGen) else (intervalGen, pointProj)
      val joined = Join(newLeft, newRight, Inner, Some(newCond), j.hint)
      // band columns are internal — restore the original output exactly
      Project(j.output, joined)
    }
  }

  /** Interval×interval overlap: a conjunct pair `L.lo ⋞ R.hi` and
    * `R.lo ⋞ L.hi` (⋞ = < or <=, either written order) with no equi key.
    * The physical-plan form of JoinOps.bandedIntervalOverlapJoin: BOTH
    * sides explode across their bands, and each true pair is admitted
    * only in its canonical band — the band of greatest(L.lo, R.lo), the
    * overlap's left edge. Why that band works: wlog L.lo <= R.lo (the
    * other case is symmetric). Then the canonical band is R.lo's band,
    * which the right side always emits; the overlap predicate gives
    * R.lo <= L.hi, so band(L.lo) <= band(R.lo) <= band(L.hi) and the
    * left side's contiguous band range emits it too. Uniqueness is by
    * construction (one canonical band per pair), so the rewrite needs no
    * dedup — the duplicate-elimination the naive banded overlap join
    * would otherwise buy with a distinct shuffle over the full result. */
  private def rewriteOverlap(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    if (hasEquiKey(j, conjuncts)) return None

    // normalize cross-side inequalities to (leftExpr, rightExpr,
    // leftIsLower): leftIsLower ⇔ the left side's expr is the ≤ side
    def orient(lo: Expression, hi: Expression)
        : Option[(Expression, Expression, Boolean)] =
      if (from(lo, j.left) && from(hi, j.right)) Some((lo, hi, true))
      else if (from(lo, j.right) && from(hi, j.left)) Some((hi, lo, false))
      else None
    def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]
    val ineqs = conjuncts.flatMap {
      case LessThanOrEqual(a, b)    => orient(a, b)
      case LessThan(a, b)           => orient(a, b)
      case GreaterThanOrEqual(a, b) => orient(b, a)
      case GreaterThan(a, b)        => orient(b, a)
      case _                        => None
    }
    val candidates = for {
      (llo, rhi, dir1) <- ineqs if dir1   // L.lo ⋞ R.hi
      (lhi, rlo, dir2) <- ineqs if !dir2  // R.lo ⋞ L.hi
      if Seq(llo, lhi, rlo, rhi).forall(numeric)
    } yield (llo, lhi, rlo, rhi)

    candidates.headOption.map { case (llo, lhi, rlo, rhi) =>
      val lBandAttr = AttributeReference("__l_band", LongType, nullable = true)()
      val rBandAttr = AttributeReference("__r_band", LongType, nullable = true)()
      val leftGen = Generate(bandExplode(llo, lhi, w),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(lBandAttr), child = j.left)
      val rightGen = Generate(bandExplode(rlo, rhi, w),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rBandAttr), child = j.right)
      // Greatest requires same-typed children; the two sides' range
      // columns may be different numeric widths (int vs long vs double),
      // so compare in DOUBLE — bandOfW casts its input to double anyway
      val canonical = EqualTo(
        bandOfW(Greatest(Seq(Cast(llo, DoubleType), Cast(rlo, DoubleType))), w),
        Cast(lBandAttr, LongType))
      val newCond = (EqualTo(lBandAttr, rBandAttr) +: canonical +: conjuncts)
        .reduce(And.apply)
      val joined = Join(leftGen, rightGen, Inner, Some(newCond), j.hint)
      Project(j.output, joined)
    }
  }
}

object BandedRangeJoinRule {
  /** Imperative attach for sessions built without the extensions conf. */
  def register(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[BandedRangeJoinRule])
    if (!already)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedRangeJoinRule(spark)
  }
}
