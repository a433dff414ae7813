package graft

import graft.functions.GraftFunctions

/** Uses the shared session + the runtime registration path (the
  * builder-time GraftExtensions path would need a fresh session, and
  * getOrCreate silently reuses the shared one). */
class DotProductRewriteSpec extends SparkSpec {

  test("lambda dot products are rewritten to the codegen expression") {
    GraftFunctions.register(spark)
    val df = spark.range(100)
      .selectExpr("array(id, id + 1L, id + 2L) AS a", "array(id, id, id) AS b")
      .selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, e) -> acc + e) AS dot")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_dot_long"), optimized)
    // and the rewrite preserves values exactly
    val manual = spark.range(100)
      .selectExpr("id * id + (id + 1) * id + (id + 2) * id AS dot")
    assert(df.collect().map(_.getLong(0)).toSeq ===
      manual.collect().map(_.getLong(0)).toSeq)
  }

  test("non-dot-product aggregates are left untouched") {
    GraftFunctions.register(spark)
    val df = spark.range(10)
      .selectExpr("array(id, id + 1L) AS a", "array(id, id) AS b")
      .selectExpr("aggregate(zip_with(a, b, (x, y) -> x + y), 0L, (acc, e) -> acc + e) AS s")
    assert(!df.queryExecution.optimizedPlan.toString.contains("array_dot_long"))
    assert(df.count() === 10)
  }
}
