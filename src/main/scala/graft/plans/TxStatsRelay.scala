package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** Relay V2 statistics across the V1Scan execution bridge.
  *
  * A `V1Scan` face (graft-tx catalog tables execute through the V1
  * relation for Spark's vectorized parquet readers) is wrapped in
  * Spark's `V1ScanWrapper` during scan push-down — and the wrapper
  * does not forward `SupportsReportStatistics`, so the logical
  * relation above it reports `defaultSizeInBytes` (8 EiB): a catalog
  * graft-tx dimension table NEVER auto-broadcasts and the cost-based
  * optimizer sees no row counts or column stats, however precise the
  * commit metadata underneath is. This rule swaps the wrapper for a
  * subclass that relays `estimateStatistics` from the wrapped scan —
  * behavior-identical otherwise (same fields, same `V1ScanWrapper`
  * pattern match at physical planning). It registers through
  * `spark.experimental.extraOptimizations` (GraftFunctions.register):
  * in Spark 4.1 that "User Provided Optimizers" batch is the one
  * extension point that runs AFTER scan push-down mints the wrapper —
  * injectOptimizerRule and injectPreCBORule batches both precede it.
  * Running last means physical join selection (broadcast decisions)
  * and every stats consumer downstream see the metadata numbers; the
  * logical join-reorder batch, which runs mid-optimizer, does not —
  * the SPJ face, a native V2 scan, covers that case without relaying.
  * The reference sizes its map-side join inputs
  * from file lengths the same way — a join input below
  * `mapred.map.multithreadedrunner.threads`-scale memory loads as the
  * in-memory side (src/mapred/org/apache/hadoop/mapred/join/
  * CompositeInputFormat.java:1); here the size signal reaches
  * Catalyst's broadcast decision instead. */
object TxStatsRelay extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r @ DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _)
      if w.v1Scan.isInstanceOf[SupportsReportStatistics] &&
        !w.isInstanceOf[SupportsReportStatistics] =>
      r.copy(scan = new StatsV1ScanWrapper(
        w.v1Scan, w.handledFilters, w.pushedDownOperators))
  }
}

/** A `V1ScanWrapper` that forwards the wrapped scan's statistics —
  * nothing else changes: `V1ScanWrapper`'s extractor and accessors
  * see the same three fields, so physical planning is untouched. */
class StatsV1ScanWrapper(v1Scan: V1Scan, handled: Seq[Filter],
  ops: PushedDownOperators)
  extends V1ScanWrapper(v1Scan, handled, ops)
  with SupportsReportStatistics {
  override def estimateStatistics(): Statistics =
    v1Scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
  // the inherited case-class equality would make the relayed wrapper
  // EQUAL the plain one, so transform's fastEquals would discard the
  // swap as a no-op — distinguish by class (canEqual keeps symmetry)
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
}
