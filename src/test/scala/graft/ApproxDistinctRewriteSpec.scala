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

  test("fires inside CUBE: every grouping-set cell gets the sketch estimate") {
    GraftFunctions.register(spark)
    spark.conf.set(ApproxDistinctRewrite.flagKey, "true")
    try {
      val ev = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull)
        .withColumn("device", pmod(col("event_id"), lit(5)).cast("string"))
      val df = ev.cube("event_type", "device")
        .agg(countDistinct(col("user_id").cast("string")).as("u"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("kmv_uniq"), opt)
      assert(opt.contains("Expand"), "cube's own Expand survives the rewrite")
      val got = df.collect().map(r =>
        (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2)).toMap
      spark.conf.unset(ApproxDistinctRewrite.flagKey)
      val exact = ev.cube("event_type", "device")
        .agg(countDistinct(col("user_id").cast("string")).as("u"))
        .collect().map(r =>
          (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2)).toMap
      assert(got.keySet === exact.keySet)
      // cells under k estimate exactly; the rest within KMV tolerance
      exact.foreach { case (cell, n) =>
        if (n < 256) assert(got(cell) === n, s"cell $cell below k must be exact")
        else assert(math.abs(got(cell) - n).toDouble / n < 0.25, s"cell $cell")
      }
    } finally spark.conf.unset(ApproxDistinctRewrite.flagKey)
  }

  test("two count-distincts in one aggregate: both rewrite, no Expand remains") {
    // Only the extensions injection point (the cluster deployment path)
    // sees multi-distinct aggregates intact: the runtime
    // extraOptimizations hook runs after RewriteDistinctAggregates has
    // already expanded them, where the rule correctly no-ops.
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s2.conf.set(ApproxDistinctRewrite.flagKey, "true")
    try {
      val ev = Tables.events(s2, sfDir)
        .filter(col("user_id").isNotNull)
        .withColumn("device", pmod(col("event_id"), lit(5)).cast("string"))
      val df = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id").cast("string")).as("u"),
          countDistinct(col("device")).as("d"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("kmv_uniq"), opt)
      assert(!opt.contains("count(distinct"), opt)
      // the exact 2-distinct plan replicates the input via Expand; the
      // sketch plan is one ordinary aggregation pass
      assert(!df.queryExecution.executedPlan.toString.contains("Expand"),
        "no distinct aggregates left, so no Expand replication")
      val got = df.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      s2.conf.unset(ApproxDistinctRewrite.flagKey)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id").cast("string")).as("u"),
          countDistinct(col("device")).as("d"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      exact.foreach { case (k, (u, d)) =>
        if (u < 256) assert(got(k)._1 === u)
        if (d < 256) assert(got(k)._2 === d)
      }
    } finally {
      s2.conf.unset(ApproxDistinctRewrite.flagKey)
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("repeated count-distinct of one column shares a single sketch buffer") {
    GraftFunctions.register(spark)
    val df = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u1"),
        (countDistinct(col("user_id")) * 2).as("u2"))
    val rewritten = ApproxDistinctRewrite.rewrite(df.queryExecution.analyzed)
    val aggs = rewritten.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.flatMap(_.collect {
          case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => ae
        })
    }.flatten
    assert(aggs.size === 2, "both output columns carry the aggregate")
    assert(aggs.map(_.resultId).distinct.size === 1,
      "one shared sketch, not one per output column")
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
