package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class ArrayDotLongSpec extends SparkSpec {

  test("array_dot_long matches the interpreted lambda form exactly") {
    GraftFunctions.register(spark)
    val df = spark.range(1000)
      .withColumn("a", expr("transform(sequence(1, 64), i -> (id * i) % 997 - 498)"))
      .withColumn("b", expr("transform(sequence(1, 64), i -> (id + i * 7) % 1009 - 504)"))
      .select(
        expr("array_dot_long(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)").as("lambda"))
    assert(df.filter(col("native") =!= col("lambda")).count() === 0)
  }

  test("array_dot_long participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // plain array() constructor: a transform() lambda in the same
    // projection would itself knock the Project out of codegen
    val df = spark.range(10)
      .select(expr("array_dot_long(array(id, id + 1L), array(id, id + 2L))").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect().map(_.getLong(0)).sum > 0)
  }

  test("mismatched lengths use the common prefix; empty arrays give 0") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq((Seq(2L, 3L, 4L), Seq(10L, 10L)), (Seq.empty[Long], Seq(1L)))
      .toDF("a", "b")
      .select(expr("array_dot_long(a, b)")).collect().map(_.getLong(0))
    assert(r.toSeq === Seq(50L, 0L))
  }
}
