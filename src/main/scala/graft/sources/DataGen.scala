package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed data generation (ref: src/examples/org/
  * apache/hadoop/examples/RandomWriter.java:1, RandomTextWriter
  * .java:1, terasort/TeraGen.java:1): `spark.range` partitions the id
  * space across executors and every derived column is a pure function
  * of the id, so any scale factor regenerates identically with zero
  * shuffle and zero driver involvement.
  */
object DataGen {

  /** n rows of (id, key, payload word text) — a RandomTextWriter
    * analog. */
  def text(spark: SparkSession, n: Long, wordsPerRow: Int = 20): DataFrame =
    spark.range(n)
      .withColumn("key", expr("md5(cast(cast(id as string) as binary))"))
      .withColumn("text", expr(
        s"""array_join(transform(sequence(1, $wordsPerRow),
           |  i -> substring(md5(cast(concat(cast(id as string), ':', cast(i as string)) as binary)), 1, 6)), ' ')""".stripMargin))

  /** Monte-carlo π with a deterministic low-discrepancy (Halton-ish)
    * sequence (ref: examples/PiEstimator.java:1). */
  def piEstimate(spark: SparkSession, n: Long): Double = {
    val inside = spark.range(n)
      .withColumn("x", expr("(cast(id % 10007 as double) + 0.5) / 10007"))
      .withColumn("y", expr("(cast((id * 7919) % 10007 as double) + 0.5) / 10007"))
      .filter(expr("x * x + y * y <= 1.0")).count()
    4.0 * inside / n
  }
}
