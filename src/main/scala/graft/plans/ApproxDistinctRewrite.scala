package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: under `spark.graft.approxDistinct=true`, rewrite
  * exact `count(DISTINCT c)` aggregates into the bounded-state KMV
  * θ-sketch estimate (`plans.KmvUniq`) — the optimizer-driven form of
  * the UniqValueCount → sketch substitution (ref: src/mapred/org/
  * apache/hadoop/mapred/lib/aggregate/UniqValueCount.java:1). An exact
  * distinct count shuffles every distinct value; the rewritten plan
  * ships ≤ k×32 bytes per group through the shuffle, which is the only
  * distinct-count shape that survives 100 TB group-bys.
  *
  * The substituted expression is `floor(kmv_uniq(md5(cast(c as
  * string)), k).est)` cast to the original BIGINT type, so the rewrite
  * is schema-transparent. `floor` (not a double→long cast) because the
  * two engines' casts round differently while floor is exact on IEEE
  * doubles — the estimate stays bitwise reproducible and the rewritten
  * query remains oracle-hashable (q_approx_distinct). Groups with
  * fewer than k distinct values estimate EXACTLY (the sketch holds
  * them all), so small groups lose nothing.
  *
  * Fires only on single-argument, unfiltered count-distincts of
  * atomic-typed children; anything else is left to the exact path.
  * Injected via `GraftExtensions.injectOptimizerRule` and the
  * `experimental.extraOptimizations` runtime hook — both gated by the
  * conf flag; `rewrite(plan)` applies unconditionally for callers that
  * opt in per-plan rather than per-session. The two hooks differ on
  * MULTI-distinct aggregates: the extensions point runs inside the
  * operator-optimization batch, before RewriteDistinctAggregates, so
  * it rewrites all of them (and the plan loses its N× Expand
  * replication); the runtime hook runs after that expansion and
  * correctly no-ops there, leaving the exact path.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val flagKey = "spark.graft.approxDistinct"
  val kKey = "spark.graft.approxDistinct.k"

  private def enabled: Boolean =
    SQLConf.get.getConfString(flagKey, "false").toBoolean
  private def configuredK: Int =
    SQLConf.get.getConfString(kKey, "256").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else rewrite(plan, configuredK)

  /** Scalar types whose string rendering is a stable distinct key
    * (AtomicType itself is private[sql] in Spark 4). */
  private def scalarHashable(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | DateType | TimestampType => true
    case _: NumericType => true
    case _ => false
  }

  /** Unconditional rewrite (per-plan opt-in).
    *
    * Breadth notes: by optimizer time ROLLUP/CUBE/GROUPING SETS are
    * already `Aggregate` over `Expand`, so the match fires inside
    * them unchanged — every cube cell gets the bounded-state estimate
    * (the KMV-per-cube-cell shape of `Sketches.kmvCube`, chosen by
    * the optimizer instead of by hand). Multiple count-distincts in
    * ONE aggregate all rewrite, which removes every distinct
    * aggregate from the plan — the exact path would Expand the input
    * N× (one replica per distinct column); the rewritten plan is a
    * single ordinary pass. Repeated count-distincts of the SAME child
    * share one sketch: the cache below reuses the identical
    * AggregateExpression (same resultId), so physical planning
    * deduplicates it into a single buffer instead of sketching the
    * column once per output column. */
  def rewrite(plan: LogicalPlan, k: Int = 256): LogicalPlan =
    plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        val shared = scala.collection.mutable.Map.empty[Expression, Expression]
        val next = agg.aggregateExpressions.map { ne =>
          ne.transformUp {
            case AggregateExpression(Count(Seq(c)), _, true, None, _)
              if scalarHashable(c.dataType) =>
              val est = shared.getOrElseUpdate(c.canonicalized, {
                val hashed = Md5(Cast(Cast(c, StringType,
                  Some(SQLConf.get.sessionLocalTimeZone)), BinaryType))
                GetStructField(
                  KmvUniq(hashed, k).toAggregateExpression(), 0, Some("est"))
              })
              Cast(Floor(est), LongType)
          }.asInstanceOf[NamedExpression]
        }
        agg.copy(aggregateExpressions = next)
    }
}
