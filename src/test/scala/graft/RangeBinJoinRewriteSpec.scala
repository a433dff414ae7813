package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class RangeBinJoinRewriteSpec extends SparkSpec {

  private def sides: (DataFrame, DataFrame) = {
    import spark.implicits._
    // negatives included: truncating division's double-width zero cell
    // is the soundness edge case
    val a = Seq(-25L, -10L, -1L, 0L, 3L, 9L, 27L, 100L).toDF("ta")
    val b = Seq(-31L, -11L, -9L, 2L, 8L, 19L, 33L, 95L).toDF("tb")
    (a, b)
  }

  test("rewritten band join returns exactly the naive join's rows") {
    GraftFunctions.register(spark)
    val (a, b) = sides
    val joined = a.join(b, expr("abs(ta - tb) <= 10L"))
    // rule must have fired: no nested loop in the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth computed directly
    val expected = (for {
      x <- Seq(-25L, -10L, -1L, 0L, 3L, 9L, 27L, 100L)
      y <- Seq(-31L, -11L, -9L, 2L, 8L, 19L, 33L, 95L)
      if math.abs(x - y) <= 10
    } yield (x, y)).toSet
    assert(got === expected)
    // no duplicates: every pair meets exactly once
    assert(joined.count() === expected.size.toLong)
  }

  test("single-side extra conjuncts still benefit (pushed down before the rule)") {
    GraftFunctions.register(spark)
    val (a, b) = sides
    // Catalyst pushes `ta > 0` into the left scan first, leaving the
    // pure band pattern — so the rule fires for this query too
    val q = a.join(b, expr("abs(ta - tb) <= 10L AND ta > 0"))
    assert(q.queryExecution.optimizedPlan.toString.contains("_range_bin"))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      x <- Seq(3L, 9L, 27L, 100L)
      y <- Seq(-31L, -11L, -9L, 2L, 8L, 19L, 33L, 95L)
      if math.abs(x - y) <= 10
    } yield (x, y)).toSet
    assert(got === expected)
  }

  test("rule leaves cross-side compound conditions alone") {
    GraftFunctions.register(spark)
    val (a, b) = sides
    // `ta + tb > 0` references both sides, so it stays in the join
    // condition and the shape is no longer the pure band pattern
    val q = a.join(b, expr("abs(ta - tb) <= 10L AND ta + tb > 0"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("_range_bin"), optimized)
    val expected = (for {
      x <- Seq(-25L, -10L, -1L, 0L, 3L, 9L, 27L, 100L)
      y <- Seq(-31L, -11L, -9L, 2L, 8L, 19L, 33L, 95L)
      if math.abs(x - y) <= 10 && x + y > 0
    } yield (x, y)).toSet
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
  }

  test("keys at the exact Long extremes neither throw under ANSI nor drop pairs") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // C = 1 is the only case where rDiv±1 can overflow; keys cluster at
    // each extreme so the naive abs() never overflows and ground truth
    // is well-defined
    val a = Seq(Long.MaxValue, Long.MaxValue - 2, Long.MinValue, Long.MinValue + 2).toDF("ta")
    val b = Seq(Long.MaxValue - 1, Long.MaxValue - 3, Long.MinValue + 1, Long.MinValue + 3).toDF("tb")
    val joined = a.join(b, expr("abs(ta - tb) <= 1L"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("_range_bin"))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      x <- Seq(Long.MaxValue, Long.MaxValue - 2, Long.MinValue, Long.MinValue + 2)
      y <- Seq(Long.MaxValue - 1, Long.MaxValue - 3, Long.MinValue + 1, Long.MinValue + 3)
      if (x > 0) == (y > 0) && math.abs(x - y) <= 1
    } yield (x, y)).toSet
    assert(got === expected)
    assert(joined.count() === expected.size.toLong)
  }

  test("events band join through the rule matches rangeJoinBinned") {
    GraftFunctions.register(spark)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), expr("unix_micros(ts)").as("t"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("t").as("te"))
    val clicks = ev.filter(col("event_type") === "click").select(col("t").as("tc"))
    val viaRule = errors.join(clicks, expr("abs(te - tc) <= 300000000L"))
      .groupBy("eid").agg(count(lit(1)).as("n"))
    val viaOperator = graft.operators.Olap.rangeJoinBinned(spark, sfDir)
      .filter(col("n_nearby") > 0)
    assert(viaRule.count() === viaOperator.count())
    assert(viaRule.join(viaOperator,
      viaRule("eid") === viaOperator("eid") && viaRule("n") === viaOperator("n_nearby"))
      .count() === viaOperator.count())
  }
}
