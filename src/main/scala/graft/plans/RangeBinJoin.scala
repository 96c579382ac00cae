package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** The range-join optimization as a REAL plan rewrite (the feature
  * Databricks ships as the RANGE_JOIN hint; Spark core still plans a
  * point-in-interval join without a selective equi-key as a nested-loop
  * cross product). A user writes the NAIVE join and opts in per-join:
  *
  * {{{
  * points.join(intervals.hint("range_bin", 3600),
  *   pts("k") === ivs("k") && pts("ts") >= ivs("s") && pts("ts") <= ivs("e"))
  * }}}
  *
  * Machinery (all via SparkSessionExtensions — see [[GraftExtensions]]):
  *  1. [[RangeBinHintRule]] (resolution rule): rewrites the analyzer's
  *     `UnresolvedHint("range_bin", width)` into the custom logical node
  *     [[RangeBinHint]] BEFORE Spark's hint-removal batch discards it.
  *  2. [[RangeBinJoinRule]] (optimizer rule): matches an INNER join whose
  *     other side carries the marker and whose condition contains
  *     `p >= s && p <= e` with `p` a timestamp on one side and `s`/`e`
  *     timestamps on the other; rewrites to the binned form — the point
  *     side projects `bin(p)`, the interval side explodes
  *     `sequence(bin(s), bin(e))`, and bin-equality joins the two — with
  *     the original range condition kept as the exact residual filter.
  *     Candidate pairs are then only those sharing a grid cell: cost
  *     scales with true overlap density, not |points|×|intervals|, and a
  *     pure range join (NO equi key at all) becomes an equi-join instead
  *     of a BroadcastNestedLoopJoin. Stray markers are stripped, so no
  *     custom physical strategy is needed.
  *
  * Binning uses integer truncating division of epoch micros — monotone,
  * so `s ≤ p ≤ e` implies `bin(p) ∈ [bin(s), bin(e)]`: the rewrite is
  * row-for-row exact (each matching pair meets in exactly one cell, the
  * point's own). Width trades interval fan-out against residual-filter
  * precision, same contract as [[graft.ops.RangeJoin.intervalJoin]].
  */
case class RangeBinHint(binSeconds: Long, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): RangeBinHint = copy(child = newChild)
}

/** Analyzer rule: `hint("range_bin", <seconds>)` → [[RangeBinHint]]. */
case class RangeBinHintRule(
    spark: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, Seq(w), child)
        if name.equalsIgnoreCase("range_bin") && child.resolved =>
      val width = w match {
        case Literal(v: Int, IntegerType) => v.toLong
        case Literal(v: Long, LongType) => v
        case other => throw new IllegalArgumentException(
          s"range_bin expects an integer bin width in seconds, got $other")
      }
      require(width > 0, "range_bin width must be positive")
      RangeBinHint(width, child)
  }
}

/** Optimizer rule: rewrite marked naive range joins to the binned form.
  *
  * Runs inside the fixed-point operator-optimization batch and must NOT
  * strip unmatched markers there: on the batch's first iteration the
  * range predicates may still sit in a Filter above the Join (pushdown
  * has not reached it yet) and pruning may have inserted a Project
  * between the join and the marker — stripping then would silently
  * forfeit the rewrite a later iteration could do. Leftover markers are
  * removed by [[RangeBinStripRule]] AFTER the batch (pre-CBO), with a
  * warning, so an ineligible hint degrades loudly to the naive plan.
  */
case class RangeBinJoinRule(
    spark: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    RangeBinJoin.rewriteJoins(plan, conf.sessionLocalTimeZone)
}

/** Post-batch (pre-CBO, runs once) cleanup: one last rewrite attempt,
  * then strip any marker that never matched — nothing may reach
  * physical planning, but the fallback to the naive plan is LOGGED
  * instead of silent.
  */
case class RangeBinStripRule(
    spark: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val joined = RangeBinJoin.rewriteJoins(plan, conf.sessionLocalTimeZone)
    joined.transformUp { case RangeBinHint(_, child) =>
      logWarning("range_bin hint did not match an eligible inner " +
        "point-in-interval join; falling back to the unhinted plan")
      child
    }
  }
}

object RangeBinJoin extends PredicateHelper {

  def rewriteJoins(plan: LogicalPlan, timeZone: String): LogicalPlan =
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        tryRewrite(j, timeZone).getOrElse(j)
    }

  /** The marker may sit directly on the join side or below a chain of
    * Project/Filter nodes the optimizer inserted (column pruning,
    * pushed predicates). Returns the bin width and the side with the
    * (output-transparent) marker removed, chain preserved.
    */
  private def unwrap(p: LogicalPlan): Option[(Long, LogicalPlan)] =
    p match {
      case RangeBinHint(w, c) => Some((w, c))
      case pr: Project =>
        unwrap(pr.child).map { case (w, c) => (w, pr.copy(child = c)) }
      case f: Filter =>
        unwrap(f.child).map { case (w, c) => (w, f.copy(child = c)) }
      case _ => None
    }

  private def tryRewrite(j: Join, timeZone: String): Option[LogicalPlan] = {
    val (width, left, right, pointOnLeft) =
      unwrap(j.right).map { case (w, r) => (w, j.left, r, true) }
        .orElse(unwrap(j.left).map { case (w, l) => (w, l, j.right, false) })
        .getOrElse(return None)
    val (pointSide, intervalSide) =
      if (pointOnLeft) (left, right) else (right, left)
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    // normalize a >= / <= conjunct into (pointExpr, boundExpr, isLower)
    def normalize(c: Expression): Option[(Attribute, Attribute, Boolean)] = {
      def sides(a: Expression, b: Expression, lower: Boolean) =
        (a, b) match {
          case (p: Attribute, s: Attribute)
              if pointSide.outputSet.contains(p) &&
                intervalSide.outputSet.contains(s) =>
            Some((p, s, lower))
          case _ => None
        }
      c match {
        case GreaterThanOrEqual(a, b) =>
          sides(a, b, lower = true).orElse( // p >= s
            (a, b) match { // e >= p  (upper bound, reversed)
              case (s: Attribute, p: Attribute)
                  if pointSide.outputSet.contains(p) &&
                    intervalSide.outputSet.contains(s) =>
                Some((p, s, false))
              case _ => None
            })
        case LessThanOrEqual(a, b) =>
          ((a, b) match { // p <= e
            case (p: Attribute, e: Attribute)
                if pointSide.outputSet.contains(p) &&
                  intervalSide.outputSet.contains(e) =>
              Some((p, e, false))
            case _ => None
          }).orElse((a, b) match { // s <= p
            case (s: Attribute, p: Attribute)
                if pointSide.outputSet.contains(p) &&
                  intervalSide.outputSet.contains(s) =>
              Some((p, s, true))
            case _ => None
          })
        case _ => None
      }
    }
    def isTs(a: Attribute): Boolean = a.dataType match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    val bounds = conjuncts.flatMap(normalize(_)).filter { case (p, b, _) =>
      isTs(p) && isTs(b)
    }
    val lowers = bounds.filter(_._3)
    val uppers = bounds.filterNot(_._3)
    // need one lower and one upper bound on the SAME point attribute
    val matched = (for {
      (p1, s, _) <- lowers
      (p2, e, _) <- uppers if p1.semanticEquals(p2)
    } yield (p1, s, e)).headOption
    matched.map { case (p, s, e) =>
      val wMicros = Literal(width * 1000000L, LongType)
      def binOf(a: Attribute): Expression = {
        val micros = a.dataType match {
          case TimestampType => UnixMicros(a)
          case _ => UnixMicros(Cast(a, TimestampType))
        }
        IntegralDivide(micros, wMicros, evalMode = EvalMode.LEGACY)
      }
      val binP = Alias(binOf(p), "__graft_bin")()
      val newPointSide = Project(pointSide.output :+ binP, pointSide)
      val binI = AttributeReference("__graft_bin_i", LongType,
        nullable = false)()
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays UNRESOLVED and the optimizer rejects the rewritten plan
      val gen = Explode(new Sequence(binOf(s), binOf(e), Literal(1L))
        .withTimeZone(timeZone))
      // guard malformed intervals (e < s, or a NULL bound): Sequence
      // throws on start > stop, where the unhinted naive join simply
      // matches nothing — the hint must not turn bad data into a query
      // failure, so such rows are dropped before the Generate (the
      // residual range condition could never accept them anyway)
      val newIntervalSide = Generate(gen, unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(binI),
        child = Filter(LessThanOrEqual(s, e), intervalSide))
      val binEq = EqualTo(binP.toAttribute, binI)
      val (nl, nr) =
        if (pointOnLeft) (newPointSide, newIntervalSide)
        else (newIntervalSide, newPointSide)
      // the ORIGINAL condition stays as the exact residual; Project on
      // top restores the join's public output (drops the bin columns)
      Project(j.output,
        Join(nl, nr, Inner, Some(And(j.condition.get, binEq)), j.hint))
    }
  }
}
