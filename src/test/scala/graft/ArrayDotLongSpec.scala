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

  test("edge cases match the lambda form: length mismatch and null elements → NULL") {
    GraftFunctions.register(spark)
    // zip_with pads the shorter array with nulls and acc + null = null,
    // so the lambda form is NULL on unequal lengths / null elements;
    // the native expression must agree for the rewrite to be sound.
    val df = spark.sql("""
      SELECT a, b,
        array_dot_long(a, b) AS native,
        aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS lambda
      FROM VALUES
        (array(2L, 3L, 4L), array(10L, 10L)),
        (array(), array(1L)),
        (array(1L, CAST(NULL AS BIGINT)), array(5L, 6L)),
        (CAST(NULL AS ARRAY<BIGINT>), array(1L)),
        (array(), array()),
        (array(2L, 3L), array(4L, 5L)) AS t(a, b)""")
    val rows = df.collect()
    for (r <- rows)
      assert(r.isNullAt(2) == r.isNullAt(3) &&
        (r.isNullAt(2) || r.getLong(2) == r.getLong(3)),
        s"native=${r.get(2)} lambda=${r.get(3)} for a=${r.get(0)} b=${r.get(1)}")
    // the two non-degenerate rows: empty·empty = 0, (2,3)·(4,5) = 23
    assert(rows.count(r => !r.isNullAt(2)) === 2)
  }
}
