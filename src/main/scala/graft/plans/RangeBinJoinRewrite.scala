package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: a pure inequality band join
  *
  *   a JOIN b ON abs(a.t - b.t) <= C          (t bigint, C > 0 literal)
  *
  * gives Spark no equi-key, so it plans a BroadcastNestedLoopJoin /
  * CartesianProduct — O(|a|·|b|) work that is unrunnable at warehouse
  * scale. This rule rewrites it into the binned form
  * (Olap.rangeJoinBinned as an automatic transformation): bucket both
  * sides by `t div C`, replicate the right side to bin−1/bin/bin+1,
  * and join on bin equality with the original predicate kept as a
  * residual filter.
  *
  * Sound because any two points within distance C land in the same or
  * adjacent bins: both floor- and truncating-division cells are
  * intervals of width ≥ C, and an interval of length C crosses at most
  * one cell boundary. Each qualifying pair then meets EXACTLY once —
  * on the left row's own bin — so no dedup is needed, and the residual
  * predicate discards adjacent-bin pairs beyond C. The rewrite fires
  * only when the band predicate is the ENTIRE join condition, so the
  * rewritten join (an And) can never re-fire.
  *
  * Injected via GraftExtensions.injectOptimizerRule alongside
  * DotProductRewrite.
  */
object RangeBinJoinRewrite extends Rule[LogicalPlan] {

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner,
      Some(cond @ LessThanOrEqual(Abs(Subtract(x, y, _), _), climit)), hint)
      if j.resolved && x.dataType == LongType && y.dataType == LongType &&
        longLit(climit).exists(_ > 0) &&
        x.deterministic && y.deterministic =>
      val c = longLit(climit).get
      if (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet))
        rewrite(j, left, right, x, y, c, cond, hint)
      else if (y.references.subsetOf(left.outputSet) &&
          x.references.subsetOf(right.outputSet))
        rewrite(j, left, right, y, x, c, cond, hint)
      else j
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
    lKey: Expression, rKey: Expression, c: Long,
    origCond: Expression, hint: JoinHint): LogicalPlan = {
    val cLit = Literal(c, LongType)
    val binL = Alias(IntegralDivide(lKey, cLit), "_range_bin_l")()
    val newLeft = Project(left.output :+ binL, left)
    val rDiv = IntegralDivide(rKey, cLit)
    val binR = AttributeReference("_range_bin_r", LongType, nullable = true)()
    // rDiv±1 can only overflow when C = 1 and the key sits exactly at a
    // Long extreme (for C > 1, |rDiv| <= 2^63/C keeps ±1 in range) —
    // which would throw under ANSI or fabricate a wrapped bin without.
    // Guard the two exact extremes with a null bin: a null never equals
    // binL, and the bin it replaces cannot exist, so no pair is lost.
    def guarded(base: Expression, bound: Long, next: Expression): Expression =
      If(EqualTo(base, Literal(bound, LongType)),
        Literal(null, LongType), next)
    val gen = Explode(CreateArray(Seq(
      guarded(rDiv, Long.MinValue, Subtract(rDiv, Literal(1L, LongType))),
      rDiv,
      guarded(rDiv, Long.MaxValue, Add(rDiv, Literal(1L, LongType))))))
    val newRight = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binR), child = right)
    val joined = Join(newLeft, newRight, Inner,
      Some(And(EqualTo(binL.toAttribute, binR), origCond)), hint)
    Project(j.output, joined)
  }
}
