package graft.plans

import org.apache.spark.sql.catalyst.expressions.DynamicPruning
import org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Cost-based join reordering for V1-face graft-tx catalog tables.
  *
  * Spark's own `CostBasedJoinReorder` runs in the mid-optimizer "Join
  * Reorder" batch — BEFORE the only extension point that can see the
  * V1ScanWrapper ([[TxStatsRelay]]'s "User Provided Optimizers"
  * batch). So when that batch ran, every graft-tx catalog relation
  * still reported `defaultSizeInBytes` and no row counts: a multi-way
  * join of catalog graft-tx tables reordered on nothing and kept the
  * written order, however precise the commit metadata underneath was
  * (TxStatsRelay.scala:26 documents the blind spot; the SPJ face — a
  * native V2 scan whose stats exist at push-down — was never blind).
  *
  * The fix runs INSIDE the same late batch, immediately after the
  * relay: once the relayed stats are on the scan relations, this rule
  * re-invokes Spark's own `CostBasedJoinReorder` — same algorithm,
  * same `spark.sql.cbo.enabled` / `spark.sql.cbo.joinReorder.enabled`
  * gates, just at a point where the inputs finally have row counts
  * and join-key NDVs. Scoped tightly: it only fires when a RELAYED
  * scan is actually in the plan (anything else already had its chance
  * at the normal batch), and never when dynamic-pruning subqueries
  * were already injected below a join (reordering under a planted DPP
  * filter is not provably sound — those plans keep Spark's order).
  * Idempotent at fixed point: re-running on its own output re-derives
  * the same order from the same stats. Reference analog: the
  * reference orders its composite join inputs by declared size too —
  * CompositeInputFormat's parser composes the smaller relation inner
  * (src/mapred/org/apache/hadoop/mapred/join/CompositeInputFormat
  * .java:1); here the signal is commit-log row counts reaching
  * Catalyst's DP join enumeration. */
object TxCboJoinReorder extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.cboEnabled || !conf.joinReorderEnabled) return plan
    val hasRelayed = plan.exists {
      case r: DataSourceV2ScanRelation =>
        r.scan.isInstanceOf[StatsV1ScanWrapper]
      case _ => false
    }
    if (!hasRelayed) return plan
    val hasDynamic = plan.exists(_.expressions.exists(_.exists {
      case _: DynamicPruning => true
      case _ => false
    }))
    if (hasDynamic) return plan
    CostBasedJoinReorder(plan)
  }
}
