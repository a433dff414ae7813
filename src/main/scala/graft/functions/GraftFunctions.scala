package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
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
      "cms_sketch", graft.plans.CmsSketch.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "mg_topk", graft.plans.MgTopK.builder, "built-in")
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
    if (!spark.experimental.extraStrategies.contains(graft.plans.LshTopKJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.LshTopKJoinStrategy
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
    ext.injectFunction((FunctionIdentifier("cms_sketch"),
      graft.plans.CmsSketch.info, graft.plans.CmsSketch.builder))
    ext.injectFunction((FunctionIdentifier("mg_topk"),
      graft.plans.MgTopK.info, graft.plans.MgTopK.builder))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeBinJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.LshTopKJoinStrategy)
  }
}
