package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.plans.ApproxDistinctRewrite

class ApproxDistinctRewriteSpec extends SparkSpec {

  private def exactQuery = Tables.events(spark, sfDir)
    .filter(col("user_id").isNotNull)
    .groupBy("event_type")
    .agg(countDistinct(col("user_id").cast("string")).as("u"))

  test("flag off: count(distinct) stays exact and unrewritten") {
    GraftFunctions.register(spark)
    spark.conf.unset(ApproxDistinctRewrite.flagKey)
    val df = exactQuery
    assert(!df.queryExecution.optimizedPlan.toString.contains("kmv_uniq"))
    val viaSql = Tables.events(spark, sfDir)
      .selectExpr("event_type", "cast(user_id as string) u")
      .groupBy("event_type").agg(expr("count(distinct u)").as("u"))
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toMap ===
      viaSql.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
  }

  test("flag on: the optimizer substitutes the KMV sketch") {
    GraftFunctions.register(spark)
    spark.conf.set(ApproxDistinctRewrite.flagKey, "true")
    try {
      val df = exactQuery
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("kmv_uniq"), opt)
      // the rewritten result equals the directly-written sketch query
      val direct = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull)
        .selectExpr("event_type", "md5(cast(cast(user_id as string) as binary)) h")
        .groupBy("event_type")
        .agg(expr("cast(floor(kmv_uniq(h, 256).est) as bigint)").as("u"))
      assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toMap ===
        direct.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
    } finally spark.conf.unset(ApproxDistinctRewrite.flagKey)
  }

  test("small groups estimate exactly; estimates track the exact counts") {
    GraftFunctions.register(spark)
    val exact = exactQuery.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val approx = operators.Sketches.approxDistinct(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val est = approx(k)
      if (n < 256) assert(est === n, s"group $k below k must be exact")
      else assert(math.abs(est - n).toDouble / n < 0.25,
        s"group $k: est $est vs exact $n beyond 6-sigma of KMV error")
    }
  }

  test("filtered and multi-arg count(distinct) are left to the exact path") {
    GraftFunctions.register(spark)
    val multi = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id"), col("event_id")).as("u"))
    assert(!ApproxDistinctRewrite.rewrite(multi.queryExecution.analyzed)
      .toString.contains("kmv_uniq"))
  }
}
