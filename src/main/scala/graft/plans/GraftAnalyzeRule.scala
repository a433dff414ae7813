package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.analysis.ResolvedTable
import org.apache.spark.sql.catalyst.plans.logical.{AnalyzeColumn, AnalyzeTable, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c, ... | FOR ALL
  * COLUMNS] [NOSCAN]` on catalog `graft-tx` tables.
  *
  * Stock Spark answers ANALYZE for v2 tables with "not supported" —
  * so a SQL-only user could never feed graft's CBO path (the NDV/
  * null-count/histogram commit headers the stats relay and the late
  * join reorder consume) even though `TxTable.analyze` has served the
  * Scala face since round 11. This post-hoc resolution rule (the
  * Delta-style command conversion, injected by [[graft.functions
  * .GraftExtensions]]) rewrites the analyzed plan into a command that
  * runs [[graft.sources.TxTable.analyze]]:
  *
  *  - `FOR COLUMNS a, b` / `FOR ALL COLUMNS` → NDV + null counts for
  *    the named (or every countable) column — one aggregate pass,
  *    committed as the `ndv:` header;
  *  - plain `COMPUTE STATISTICS` and `NOSCAN` → no-ops by design: the
  *    stats those forms maintain upstream (row count, size in bytes)
  *    are ALREADY exact in graft's commit metadata at all times —
  *    there is nothing stale to refresh, and a user inheriting the
  *    upstream cost model (plain ANALYZE = cheap) must not get a
  *    surprise full-table multi-aggregate scan. The column scan is
  *    reserved for the forms that ask for it by name.
  *
  * Sessions built without extensions reach the same operation through
  * `CALL spark_catalog.system.analyze(...)` ([[graft.sources
  * .GraftProcedures]]). */
case class GraftAnalyzeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def rootOf(r: ResolvedTable): Option[String] = r.table match {
    case t: graft.sources.GraftTxCatalogTable => Some(t.metaRoot)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case AnalyzeTable(r: ResolvedTable, partitionSpec, _)
        if rootOf(r).isDefined =>
        require(partitionSpec.isEmpty,
          "graft-tx: ANALYZE TABLE ... PARTITION is not supported — " +
            "per-dir stats are recorded at write time; analyze the table")
        // table-level forms (with or without NOSCAN) maintain row/size
        // stats, which graft's commit metadata keeps exact — no scan
        GraftAnalyzeCommand(rootOf(r).get, Seq.empty, noScan = true)
      case AnalyzeColumn(r: ResolvedTable, colsOpt, _)
        if rootOf(r).isDefined =>
        // allColumns and an absent column list both mean "every
        // countable column" — exactly TxTable.analyze's default
        GraftAnalyzeCommand(rootOf(r).get,
          colsOpt.getOrElse(Seq.empty), noScan = false)
    }
}

case class GraftAnalyzeCommand(root: String, cols: Seq[String],
  noScan: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!noScan) graft.sources.TxTable.analyze(spark, root, cols)
    Seq.empty
  }
}
