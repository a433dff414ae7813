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
  * at the normal batch), and dynamic-pruning subqueries are vetoed
  * PER SUBTREE, not per plan: reordering under a planted DPP filter
  * is not provably sound (the filter's subquery is keyed to a
  * specific build-side join and exchange reuse, and a new order could
  * strand it), so any subtree containing a DynamicPruning expression
  * keeps Spark's order — but its DPP-FREE SIBLING subtrees still
  * reorder. A star join whose fact carries DPP no longer freezes the
  * rest of the query's join trees (CboStatsSpec asserts both halves).
  *
  * Known one-way gap (by construction, documented): this rule runs in
  * the final extension batch, AFTER SparkOptimizer's PartitionPruning
  * batch — so a join order produced HERE can never receive the DPP
  * filters the new order would have enabled. The veto above is the
  * sound direction (never break planted DPP); the mirror direction
  * (replan DPP for the new order) would need the relayed stats
  * visible before the stock Join Reorder batch — an
  * injectPreCBORule-style move left for a future round.
  *
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
    reorderDppFree(plan)
  }

  private def hasDpp(p: LogicalPlan): Boolean =
    p.exists(_.expressions.exists(_.exists {
      case _: DynamicPruning => true
      case _ => false
    }))

  private def hasRelayedScan(p: LogicalPlan): Boolean = p.exists {
    case r: DataSourceV2ScanRelation =>
      r.scan.isInstanceOf[StatsV1ScanWrapper]
    case _ => false
  }

  /** Top-down: the largest DPP-free subtrees reorder whole; a subtree
    * holding a DynamicPruning expression keeps its own shape but its
    * children are each given the same chance. */
  private def reorderDppFree(p: LogicalPlan): LogicalPlan =
    if (!hasDpp(p)) {
      if (hasRelayedScan(p)) CostBasedJoinReorder(p) else p
    } else p.mapChildren(reorderDppFree)
}
