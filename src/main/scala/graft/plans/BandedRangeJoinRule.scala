package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: plan a point-in-interval theta join as a banded EQUI
  * join, automatically.
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
  *  - `spark.graft.rangeJoin.bandWidth` > 0 (off by default),
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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = spark.conf.get(ConfKey, "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, w).getOrElse(j)
    }
  }

  /** p belongs wholly to `side` (non-empty refs — rules out literals). */
  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    // already an equi join on some key -> hash-joinable, leave it alone
    // (EqualNullSafe is a hash-join key for Catalyst too)
    def crossSides(l: Expression, r: Expression): Boolean =
      (from(l, j.left) && from(r, j.right)) ||
        (from(l, j.right) && from(r, j.left))
    val hasEquiKey = conjuncts.exists {
      case EqualTo(l, r)       => crossSides(l, r)
      case EqualNullSafe(l, r) => crossSides(l, r)
      case _                   => false
    }
    if (hasEquiKey) return None

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

      def bandOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble)))

      // point side: one extra projected column, its single band
      val pBand = Alias(bandOf(p), "__p_band")()
      val pointProj = Project(pointPlan.output :+ pBand, pointPlan)

      // interval side: explode the (usually <= 2) bands the interval spans
      val iBandAttr = AttributeReference("__i_band", LongType, nullable = true)()
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // reports unresolved and fails plan validation mid-optimizer.
      // Greatest clamp: an empty interval (lo > hi) must contribute zero
      // matches, but sequence(start, stop) THROWS when start > stop —
      // clamp to one band and let the exact predicate reject it.
      // Max-bands guard: a bandWidth tuned for one join's units can hit a
      // second join whose intervals span millions of bands (epoch millis
      // vs day numbers); rather than silently exploding the shuffle,
      // fail fast with a message naming the conf to fix. assert_true
      // evaluates only on rows that exceed the cap.
      val maxBands = spark.conf
        .get("spark.graft.rangeJoin.maxBands", "10000").toLong
      val lban = bandOf(lo)
      val hban = Greatest(Seq(lban, bandOf(hi)))
      val seq = Sequence(lban, hban, Some(Literal(1L)),
        Some(spark.sessionState.conf.sessionLocalTimeZone))
      val spanOk = LessThanOrEqual(Subtract(hban, lban), Literal(maxBands))
      val failure = new AssertTrue(spanOk,
        Literal("graft banded range join: interval spans more bands than " +
          "spark.graft.rangeJoin.maxBands — raise it or fix " +
          "spark.graft.rangeJoin.bandWidth to match this join's units")
      ).replacement // the runtime-replaced If(raise_error) — throws when evaluated
      val guarded = CaseWhen(Seq((spanOk, seq)),
        Some(Cast(failure, seq.dataType)))
      val gen = Explode(guarded)
      val intervalGen = Generate(gen, unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
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
