package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Hint-driven automatic range-join rewrite (SURVEY §4 preference (c),
  * the Rule face): `points.hint("range_join", width).join(intervals,
  * p >= s && p < e)` is rewritten DURING ANALYSIS into the bucketed
  * equi-join `RangeJoin.pointInInterval` spells manually — Spark would
  * otherwise plan the non-equi condition as BroadcastNestedLoopJoin.
  *
  * Mechanics: `ResolveRangeJoinHint` first converts the (unresolvable)
  * `UnresolvedHint` into the resolved marker [[RangeJoinTag]] so the
  * join's condition can resolve against the unchanged child output;
  * once the enclosing inner join IS resolved, the same rule replaces it
  * with bucket projections + a `Generate(explode(sequence(...)))`
  * interval expansion + an equi-join on the bucket + the original
  * predicate as a residual filter + a Project back to the join's exact
  * original output attributes. Joins the pattern does not cover fall
  * back silently: `StripRangeJoinTags` removes leftover markers in the
  * optimizer, leaving the plain (nested-loop) join — a hint must never
  * change semantics or break a query.
  *
  * v1 scope: INNER join, condition `p >= s AND p < e` (or the flipped
  * `s <= p` / `e > p` spellings), `p` built from left-side columns and
  * `s`/`e` from right-side columns, all integral.
  */
case class RangeJoinTag(bucketWidth: Long, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): RangeJoinTag =
    copy(child = newChild)
}

object ResolveRangeJoinHint extends Rule[LogicalPlan] {

  private def longLit(e: Any): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case v: Long => Some(v)
    case v: Int => Some(v.toLong)
    case _ => None
  }

  // exact integer floor-division mirroring RangeJoin.fdiv: the double
  // division is exact because (c - pmod(c, w)) is a multiple of w
  private def fdiv(c: Expression, w: Long): Expression = {
    val wl = Literal(w, LongType)
    Cast(Divide(
      Cast(Subtract(c, Pmod(c, wl)), DoubleType),
      Cast(wl, DoubleType)), LongType)
  }

  /** (point, start, end) when the condition is a supported range shape. */
  private def rangeShape(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromLeft(e: Expression) = e.references.subsetOf(left.outputSet) && e.references.nonEmpty
    def fromRight(e: Expression) = e.references.subsetOf(right.outputSet) && e.references.nonEmpty
    // normalize each conjunct to (p, s, GE) / (p, e, LT)
    def lower(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, s) if fromLeft(p) && fromRight(s) => Some((p, s))
      case LessThanOrEqual(s, p) if fromLeft(p) && fromRight(s) => Some((p, s))
      case _ => None
    }
    def upper(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(p, en) if fromLeft(p) && fromRight(en) => Some((p, en))
      case GreaterThan(en, p) if fromLeft(p) && fromRight(en) => Some((p, en))
      case _ => None
    }
    // integral coordinates only: bucketing floor-divides and the last
    // covered bucket is fdiv(end - 1) — on double/decimal coordinates a
    // fractional end (e.g. end=5.5, width=1) would stop the interval
    // explosion at bucket 4 and silently drop a qualifying point at 5.2.
    // The hint is advisory and must never change semantics, so a
    // non-integral shape falls back to the plain join.
    def integral(e: Expression) = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    cond match {
      case And(a, b) =>
        ((for { (p1, s) <- lower(a); (p2, en) <- upper(b) if p1.semanticEquals(p2) }
          yield (p1, s, en)) orElse
          (for { (p1, s) <- lower(b); (p2, en) <- upper(a) if p1.semanticEquals(p2) }
            yield (p1, s, en)))
          .filter { case (p, s, en) => integral(p) && integral(s) && integral(en) }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // step 1: make the hint resolvable the moment its child is
    case UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase("range_join") && child.resolved &&
          params.lengthCompare(1) == 0 && longLit(params.head).exists(_ > 0) =>
      RangeJoinTag(longLit(params.head).get, child)

    // step 2: rewrite the enclosing resolved inner join
    case j @ Join(RangeJoinTag(w, pts), ivs, Inner, Some(cond), _)
        if pts.resolved && ivs.resolved && cond.resolved =>
      rangeShape(cond, pts, ivs) match {
        case Some((p, s, en)) =>
          val pb = Alias(fdiv(p, w), "__rj_pb")()
          val ptsB = Project(pts.output :+ pb, pts)
          val ib = AttributeReference("__rj_ib", LongType, nullable = true)()
          // empty/inverted intervals match nothing and MUST be dropped
          // before the explode (sequence(a, b) with a > b runs DESCENDING)
          val ivsNonEmpty = Filter(GreaterThan(en, s), ivs)
          val ivsB = Generate(
            Explode(new Sequence(fdiv(s, w), fdiv(Subtract(en, Literal(1L)), w))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(ib), child = ivsNonEmpty)
          val bucketEq = EqualTo(pb.toAttribute, ib)
          val joined = Join(ptsB, ivsB, Inner, Some(bucketEq), JoinHint.NONE)
          // residual predicate restores exactness; Project restores the
          // original output attributes (same exprIds — pass-through)
          Project(j.output, Filter(cond, joined))
        case None => j // unsupported shape: fall back (tag stripped later)
      }
  }
}

/** Removes markers whose joins the rewrite did not cover — the hint is
  * advisory and must never break a query.
  */
object StripRangeJoinTags extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case RangeJoinTag(_, child) => child
  }
}
