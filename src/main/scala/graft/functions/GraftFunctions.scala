package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, BloomFilterMightContain}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.plans.{ArrayDotLong, MinHash12, SimHash32, TextHashExprs, WinnowFp}

/** Registration of graft's native Catalyst expressions.
  *
  * Two paths:
  *  - session builder: `.withExtensions(new GraftExtensions)` (the
  *    SparkSessionExtensions mechanism, also usable via the
  *    `spark.sql.extensions` conf on a cluster);
  *  - runtime: `GraftFunctions.register(spark)` for sessions the
  *    caller doesn't construct — operators call this themselves, so
  *    they work under any session.
  */
object GraftFunctions {
  // Spark ships native bloom-filter expressions (BloomFilterAggregate /
  // BloomFilterMightContain — the ones its own runtime row-filtering
  // injects) but does not expose them in the function registry; graft
  // surfaces them so operators like Dedup.incremental can keep a
  // full-corpus membership probe inside whole-stage codegen instead of
  // a per-row Scala UDF. The probe side requires the filter argument
  // to be a constant or scalar subquery (Dataset.scalar()).
  private[graft] val bloomAggBuilder: Seq[Expression] => Expression = {
    case Seq(c)       => new BloomFilterAggregate(c)
    case Seq(c, n)    => new BloomFilterAggregate(c, n)
    case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
    case other => throw new IllegalArgumentException(
      s"bloom_filter_agg expects 1-3 args, got ${other.size}")
  }
  private[graft] val mightContainBuilder: Seq[Expression] => Expression = {
    case Seq(bf, v) => BloomFilterMightContain(bf, v)
    case other => throw new IllegalArgumentException(
      s"might_contain expects 2 args, got ${other.size}")
  }
  private[graft] val bloomAggInfo = new ExpressionInfo(
    classOf[BloomFilterAggregate].getName, "bloom_filter_agg")
  private[graft] val mightContainInfo = new ExpressionInfo(
    classOf[BloomFilterMightContain].getName, "might_contain")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "array_dot_long", ArrayDotLong.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "simhash32", TextHashExprs.unary("simhash32", SimHash32), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash12", TextHashExprs.unary("minhash12", MinHash12), "built-in")
    reg.createOrReplaceTempFunction(
      "winnow_fp", TextHashExprs.unary("winnow_fp", WinnowFp), "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_uniq", graft.plans.KmvUniq.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_set", graft.plans.KmvUniq.setBuilder, "built-in")
    reg.createOrReplaceTempFunction(
      "hist_sketch", graft.plans.HistSketch.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "hist_quantile", graft.plans.HistQuantile.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "hist_quantile_cont", graft.plans.HistQuantileCont.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "cms_sketch", graft.plans.CmsSketch.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "mg_topk", graft.plans.MgTopK.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_filter_agg", bloomAggBuilder, "built-in")
    reg.createOrReplaceTempFunction(
      "might_contain", mightContainBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_lsh_topk", graft.plans.LshTopKJoin.tvfBuilder, "built-in")
    // same rewrite GraftExtensions injects, via the runtime hook for
    // sessions built without extensions
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DotProductRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeBinJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeBinJoinRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxDistinctRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ApproxDistinctRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxPercentileRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ApproxPercentileRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TxStatsAggRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TxStatsAggRewrite
    // the V1Scan statistics relay NEEDS this hook specifically: the
    // "User Provided Optimizers" batch is the only extension point
    // that runs AFTER scan push-down (which mints the V1ScanWrapper
    // the relay rewrites) — injectOptimizerRule and injectPreCBORule
    // batches both precede push-down in Spark 4.1
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TxStatsRelay))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TxStatsRelay
    // ... and once the relay has surfaced the stats, re-run Spark's
    // own cost-based join reorder for the V1-face tables the mid-
    // optimizer "Join Reorder" batch was blind to (must sit AFTER the
    // relay in this batch)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TxCboJoinReorder))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TxCboJoinReorder
    if (!spark.experimental.extraStrategies.contains(graft.plans.LshTopKJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.LshTopKJoinStrategy
    // SQL time travel (FOR VERSION/TIMESTAMP AS OF) resolves through
    // the session catalog's loadTable(ident, version) — install the
    // delegating graft catalog unless the deployment already chose a
    // spark_catalog implementation (never override an explicit choice).
    // CatalogManager re-reads this conf lazily, so setting it on a
    // live session takes effect at the next catalog resolution.
    // "builtin" is Spark 4.1's DEFAULT marker value, not a choice
    val curCat = spark.conf.getOption("spark.sql.catalog.spark_catalog")
    if (curCat.isEmpty || curCat.contains("builtin"))
      spark.conf.set("spark.sql.catalog.spark_catalog",
        "graft.sources.GraftCatalog")
  }
}

/** `spark.sql.extensions`-compatible injector: the function plus the
  * optimizer rewrite that upgrades interpreted lambda dot products to
  * the codegen expression. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("array_dot_long"),
      ArrayDotLong.info, ArrayDotLong.builder))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      TextHashExprs.simhashInfo, TextHashExprs.unary("simhash32", SimHash32)))
    ext.injectFunction((FunctionIdentifier("minhash12"),
      TextHashExprs.minhashInfo, TextHashExprs.unary("minhash12", MinHash12)))
    ext.injectFunction((FunctionIdentifier("winnow_fp"),
      TextHashExprs.winnowInfo, TextHashExprs.unary("winnow_fp", WinnowFp)))
    ext.injectFunction((FunctionIdentifier("kmv_uniq"),
      graft.plans.KmvUniq.uniqInfo, graft.plans.KmvUniq.builder))
    ext.injectFunction((FunctionIdentifier("kmv_set"),
      graft.plans.KmvUniq.setInfo, graft.plans.KmvUniq.setBuilder))
    ext.injectFunction((FunctionIdentifier("hist_sketch"),
      graft.plans.HistSketch.info, graft.plans.HistSketch.builder))
    ext.injectFunction((FunctionIdentifier("hist_quantile"),
      graft.plans.HistQuantile.info, graft.plans.HistQuantile.builder))
    ext.injectFunction((FunctionIdentifier("hist_quantile_cont"),
      graft.plans.HistQuantileCont.info, graft.plans.HistQuantileCont.builder))
    ext.injectFunction((FunctionIdentifier("cms_sketch"),
      graft.plans.CmsSketch.info, graft.plans.CmsSketch.builder))
    ext.injectFunction((FunctionIdentifier("mg_topk"),
      graft.plans.MgTopK.info, graft.plans.MgTopK.builder))
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      GraftFunctions.bloomAggInfo, GraftFunctions.bloomAggBuilder))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      GraftFunctions.mightContainInfo, GraftFunctions.mightContainBuilder))
    ext.injectTableFunction((FunctionIdentifier("graft_lsh_topk"),
      graft.plans.LshTopKJoin.tvfInfo, graft.plans.LshTopKJoin.tvfBuilder))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeBinJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ApproxPercentileRewrite)
    ext.injectOptimizerRule(_ => graft.plans.TxStatsAggRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.LshTopKJoinStrategy)
    // ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS] on catalog
    // graft-tx tables → TxTable.analyze (stock Spark refuses ANALYZE
    // for v2 tables); runtime-registered sessions get the same
    // operation via CALL spark_catalog.system.analyze(...)
    ext.injectPostHocResolutionRule(graft.plans.GraftAnalyzeRule)
  }
}
