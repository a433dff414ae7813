package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, PercentileDisc}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Boundary-quantile readout over a `hist_sketch` counts array: the
  * upper boundary `(j + 1) * width` of the first bucket whose
  * cumulative count reaches `ceil(p * n)` — the same integer estimate
  * `Sketches.histPercentiles` computes with a window, folded into one
  * scalar expression so the optimizer can emit it per output column.
  * Null on an empty histogram (the all-null group percentile_disc
  * would also return null). Evaluates once per GROUP (post-agg), so
  * interpreted eval costs nothing measurable against the scan.
  */
case class HistQuantile(hist: Expression, percentage: Double, width: Long)
  extends UnaryExpression with CodegenFallback {
  override def child: Expression = hist
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hist_quantile"

  override protected def nullSafeEval(h: Any): Any = {
    val arr = h.asInstanceOf[ArrayData].toLongArray()
    var n = 0L
    var i = 0
    while (i < arr.length) { n += arr(i); i += 1 }
    if (n == 0L) null
    else {
      // ceil over IEEE doubles: both Spark and the SQL oracle replay
      // the identical binary64 product, so the target rank matches
      // bitwise across engines
      val target = math.max(1L, math.ceil(percentage * n).toLong)
      var cum = 0L
      i = 0
      while (i < arr.length) {
        cum += arr(i)
        if (cum >= target) return (i + 1L) * width
        i += 1
      }
      null
    }
  }

  override protected def withNewChildInternal(
    newChild: Expression): HistQuantile = copy(hist = newChild)
}

/** Interpolating (percentile_cont) readout over a `hist_sketch`
  * counts array: continuous rank pos = p·(n−1); the estimate linearly
  * interpolates between the bucket upper boundaries at ranks
  * ⌊pos⌋+1 and ⌊pos⌋+2 — the same fixed IEEE arithmetic on exact
  * integers in every engine, so the estimate stays oracle-hashable.
  * Returns double (cont semantics interpolate). */
case class HistQuantileCont(hist: Expression, percentage: Double,
  width: Long) extends UnaryExpression with CodegenFallback {
  override def child: Expression = hist
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "hist_quantile_cont"

  private def boundaryAt(arr: Array[Long], rank: Long): Long = {
    var cum = 0L
    var i = 0
    while (i < arr.length) {
      cum += arr(i)
      if (cum >= rank) return (i + 1L) * width
      i += 1
    }
    arr.length.toLong * width
  }

  override protected def nullSafeEval(h: Any): Any = {
    val arr = h.asInstanceOf[ArrayData].toLongArray()
    var n = 0L
    var i = 0
    while (i < arr.length) { n += arr(i); i += 1 }
    if (n == 0L) null
    else {
      val pos = percentage * (n - 1).toDouble
      val floorPos = math.floor(pos)
      val frac = pos - floorPos
      val rLo = floorPos.toLong + 1L
      val vLo = boundaryAt(arr, rLo).toDouble
      if (frac == 0.0) vLo
      else {
        val vHi = boundaryAt(arr, math.min(rLo + 1L, n)).toDouble
        vLo + frac * (vHi - vLo)
      }
    }
  }

  override protected def withNewChildInternal(
    newChild: Expression): HistQuantileCont = copy(hist = newChild)
}

object HistQuantileCont {
  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[HistQuantileCont].getName, "hist_quantile_cont")
  val builder: Seq[Expression] => Expression = {
    case Seq(h, p, w) if p.foldable && w.foldable =>
      HistQuantileCont(h, HistQuantile.asDouble(p), HistQuantile.asLong(w))
    case other => throw new IllegalArgumentException(
      "hist_quantile_cont expects (hist, foldable percentage, foldable " +
        s"width), got ${other.size} args")
  }
}

/** SQL surface for the readout: `hist_quantile(hist, p, width)` over a
  * stored/streamed `hist_sketch` array — the roll-up path where
  * per-partition sketch partials persist and percentile estimates are
  * read out later (or continuously, from a streaming windowed agg)
  * without touching raw data again. */
object HistQuantile {
  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[HistQuantile].getName, "hist_quantile")
  private[plans] def asDouble(e: Expression): Double = e.eval() match {
    case d: Double => d
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"hist_quantile: non-numeric percentage $other")
  }
  private[plans] def asLong(e: Expression): Long = e.eval() match {
    case l: Long => l
    case i: Int => i.toLong
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case other => throw new IllegalArgumentException(
      s"hist_quantile: non-integral width $other")
  }
  val builder: Seq[Expression] => Expression = {
    case Seq(h, p, w) if p.foldable && w.foldable =>
      HistQuantile(h, asDouble(p), asLong(w))
    case other => throw new IllegalArgumentException(
      "hist_quantile expects (hist, foldable percentage, foldable width), " +
        s"got ${other.size} args")
  }
}

/** Optimizer rule: under `spark.graft.approxPercentile=true`, rewrite
  * exact `percentile_disc(p) WITHIN GROUP (ORDER BY v)` aggregates
  * over integral columns into the bounded-state `hist_sketch`
  * boundary-quantile estimate — the percentile twin of
  * ApproxDistinctRewrite. Exact percentile_disc materializes every
  * group's values in the aggregation buffer (OpenHashMap state
  * proportional to the group's distinct values); the rewritten plan
  * carries exactly `nbuckets` longs per group through partial
  * aggregation and the shuffle, the only shape that survives
  * percentiles over 100 TB group-bys. The estimate carries bounded
  * error `width` (the fixed-histogram trade-off), is deterministic
  * given the data, and replays bitwise in any engine — so the
  * substituted plan stays oracle-hashable (q_approx_percentile).
  *
  * Fires only on unfiltered, non-distinct, ascending percentile_disc
  * with a foldable double percentage over an integral child; anything
  * else (double children, reverse ordering, percentile_cont) keeps
  * the exact path. Width/bucket-count come from confs; repeated
  * percentiles of the SAME child share one sketch buffer via the
  * resultId-preserving cache, exactly like ApproxDistinctRewrite.
  * Injected via `GraftExtensions.injectOptimizerRule` and the
  * `experimental.extraOptimizations` runtime hook; `rewrite(plan)`
  * applies unconditionally for per-plan opt-in.
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  val flagKey = "spark.graft.approxPercentile"
  val widthKey = "spark.graft.approxPercentile.width"
  val bucketsKey = "spark.graft.approxPercentile.buckets"

  private def enabled: Boolean =
    SQLConf.get.getConfString(flagKey, "false").toBoolean
  private def configuredWidth: Long =
    SQLConf.get.getConfString(widthKey, "262144").toLong
  private def configuredBuckets: Int =
    SQLConf.get.getConfString(bucketsKey, "64").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else rewrite(plan, configuredWidth, configuredBuckets)

  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Unconditional rewrite (per-plan opt-in). */
  def rewrite(plan: LogicalPlan, width: Long = 262144L,
    buckets: Int = 64): LogicalPlan =
    plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        val shared = scala.collection.mutable.Map.empty[Expression, Expression]
        val next = agg.aggregateExpressions.map { ne =>
          ne.transformUp {
            // the percentage is foldable-double, not Literal(Double):
            // a SQL `0.5` arrives as a decimal literal under an
            // analyzer-inserted cast to double
            case AggregateExpression(
              pd @ PercentileDisc(c, pe, false, _, _, _), _, false, None, _)
              if integral(c.dataType) && pe.foldable &&
                pe.dataType == DoubleType && pe.eval() != null =>
              val p = pe.eval().asInstanceOf[Double]
              val sketch = shared.getOrElseUpdate(c.canonicalized,
                HistSketch(Cast(c, LongType), width, buckets)
                  .toAggregateExpression())
              Cast(HistQuantile(sketch, p, width), pd.dataType)
            // percentile_cont arrives post-analysis as Percentile
            // (interpolating); substitute the interpolating readout.
            // Only the unit-frequency, ascending, scalar-percentage
            // form — anything else keeps the exact path.
            case AggregateExpression(
              pc @ aggregate.Percentile(c, pe, Literal(1L, _), _, _, false),
              _, false, None, _)
              if integral(c.dataType) && pe.foldable &&
                pe.dataType == DoubleType && pe.eval() != null =>
              val p = pe.eval().asInstanceOf[Double]
              val sketch = shared.getOrElseUpdate(c.canonicalized,
                HistSketch(Cast(c, LongType), width, buckets)
                  .toAggregateExpression())
              Cast(HistQuantileCont(sketch, p, width), pc.dataType)
          }.asInstanceOf[NamedExpression]
        }
        agg.copy(aggregateExpressions = next)
    }
}
