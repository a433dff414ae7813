package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.plans.ApproxPercentileRewrite

class ApproxPercentileRewriteSpec extends SparkSpec {

  private def cents = Tables.orders(spark, sfDir)
    .select(col("o_orderpriority"),
      expr("cast(round(o_totalprice * 100, 0) as bigint)").as("cents"))

  private def exactQuery = cents
    .groupBy("o_orderpriority")
    .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").as("p50"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)").as("p90"))

  test("flag off: percentile_disc stays exact and unrewritten") {
    GraftFunctions.register(spark)
    spark.conf.unset(ApproxPercentileRewrite.flagKey)
    val df = exactQuery
    assert(!df.queryExecution.optimizedPlan.toString.contains("hist_sketch"))
  }

  test("flag on: the optimizer substitutes the histogram sketch") {
    GraftFunctions.register(spark)
    spark.conf.set(ApproxPercentileRewrite.flagKey, "true")
    spark.conf.set(ApproxPercentileRewrite.widthKey, (1L << 21).toString)
    try {
      val df = exactQuery
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("hist_sketch"), opt)
      assert(!opt.contains("percentile_disc"), opt)
      // estimate = upper boundary of the exact percentile's bucket:
      // strictly above the exact value, by at most one bucket width
      spark.conf.unset(ApproxPercentileRewrite.flagKey)
      // percentile_disc returns double; estimates are exact 2^21
      // multiples, loss-free in binary64
      val exact = exactQuery.collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1).toLong, r.getDouble(2).toLong)).toMap
      spark.conf.set(ApproxPercentileRewrite.flagKey, "true")
      val est = df.collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1).toLong, r.getDouble(2).toLong)).toMap
      assert(est.keySet === exact.keySet)
      val w = 1L << 21
      exact.foreach { case (g, (e50, e90)) =>
        val (a50, a90) = est(g)
        assert(a50 > e50 && a50 - e50 <= w, s"$g p50: est $a50 vs exact $e50")
        assert(a90 > e90 && a90 - e90 <= w, s"$g p90: est $a90 vs exact $e90")
        assert(a50 % w === 0 && a90 % w === 0, "estimates are bucket boundaries")
      }
    } finally {
      spark.conf.unset(ApproxPercentileRewrite.flagKey)
      spark.conf.unset(ApproxPercentileRewrite.widthKey)
    }
  }

  test("repeated percentiles of one column share a single sketch buffer") {
    GraftFunctions.register(spark)
    val df = cents.groupBy("o_orderpriority")
      .agg(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)").as("a"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)").as("b"))
    val rewritten = ApproxPercentileRewrite.rewrite(df.queryExecution.analyzed)
    val aggs = rewritten.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.flatMap(_.collect {
          case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => ae
        })
    }.flatten
    assert(aggs.size === 2, "both output columns carry the aggregate")
    assert(aggs.map(_.resultId).distinct.size === 1,
      "one shared histogram, not one per percentile")
  }

  test("no-fire guards: DESC and double children keep the exact path") {
    GraftFunctions.register(spark)
    def rewriteOf(aggExpr: String): String =
      ApproxPercentileRewrite.rewrite(
        cents.groupBy("o_orderpriority").agg(expr(aggExpr).as("x"))
          .queryExecution.analyzed).toString
    assert(!rewriteOf(
      "percentile_disc(0.5) WITHIN GROUP (ORDER BY cents DESC)")
      .contains("hist_sketch"), "reverse ordering must stay exact")
    val dbl = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("x"))
    assert(!ApproxPercentileRewrite.rewrite(dbl.queryExecution.analyzed)
      .toString.contains("hist_sketch"), "double child must stay exact")
  }

  test("percentile_cont substitutes the INTERPOLATING readout under the flag") {
    GraftFunctions.register(spark)
    spark.conf.set(ApproxPercentileRewrite.flagKey, "true")
    spark.conf.set(ApproxPercentileRewrite.widthKey, (1L << 21).toString)
    try {
      val df = cents.groupBy("o_orderpriority")
        .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)").as("p50"))
      // percentile_cont reaches the optimizer as Percentile (after
      // ReplaceExpressions), where the rule substitutes the cont readout
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("hist_quantile_cont"), opt)
      assert(!opt.contains("percentile"), opt)
      // the estimate interpolates inside [exact bucket's boundaries]:
      // strictly above exact - width, at most exact + width
      spark.conf.unset(ApproxPercentileRewrite.flagKey)
      val exact = cents.groupBy("o_orderpriority")
        .agg(expr("percentile(cents, 0.5D)").as("p50")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      spark.conf.set(ApproxPercentileRewrite.flagKey, "true")
      val est = df.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val w = (1L << 21).toDouble
      assert(est.keySet === exact.keySet)
      exact.foreach { case (g, e) =>
        assert(est(g) > e - w && est(g) <= e + w,
          s"$g: cont estimate ${est(g)} vs exact $e")
      }
    } finally {
      spark.conf.unset(ApproxPercentileRewrite.flagKey)
      spark.conf.unset(ApproxPercentileRewrite.widthKey)
    }
  }
}
