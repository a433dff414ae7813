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

  /** Scale a testdata dir by integer `factor` via key-shifted
    * replication — the local sf1 rung the 10×-scale bench runs on.
    * Each fact table is unioned `factor` times with its primary AND
    * foreign keys shifted by replica·(maxKey+1) of the REFERENCED
    * table, so every FK join scales linearly and replica i joins only
    * replica i (exactly how TPC-H's own dbgen scales: more customers/
    * orders/parts, same dims). `region`/`nation` stay fixed (TPC-H
    * semantics); categorical columns keep their distributions. Schemas
    * are preserved by construction (same columns, shifted values cast
    * back to the source type). Deterministic: no randomness at all. */
  def scaleUp(spark: SparkSession, srcDir: String, dstDir: String,
    factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    // events.ts is TIMESTAMP(NANOS); read as long (the same conf
    // graft.Tables.events uses) — the scaled copy stores plain int64
    // nanos, which Tables.events consumes identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def maxOf(table: String, c: String): Long =
      spark.read.parquet(s"$srcDir/$table.parquet")
        .agg(max(col(c))).collect()(0).getLong(0)
    val off = Map(
      "cust" -> maxOf("customer", "c_custkey"),
      "ord" -> maxOf("orders", "o_orderkey"),
      "part" -> maxOf("part", "p_partkey"),
      "supp" -> maxOf("supplier", "s_suppkey"),
      "ev" -> maxOf("events", "event_id"),
      "user" -> maxOf("events", "user_id"),
      // documents and embeddings share ONE id space (vec_id joins
      // doc_id — e.g. the dedup cascade's semantic stage), so both
      // shift by the same offset or replicas cross-wire
      "doc" -> math.max(maxOf("documents", "doc_id"),
        maxOf("embeddings", "vec_id"))
    ).map { case (k, v) => k -> (v + 1L) }
    val plan: Seq[(String, Seq[(String, String)])] = Seq(
      "region" -> Seq.empty,
      "nation" -> Seq.empty,
      "customer" -> Seq("c_custkey" -> "cust"),
      "supplier" -> Seq("s_suppkey" -> "supp"),
      "part" -> Seq("p_partkey" -> "part"),
      "orders" -> Seq("o_orderkey" -> "ord", "o_custkey" -> "cust"),
      "lineitem" -> Seq("l_orderkey" -> "ord", "l_partkey" -> "part",
        "l_suppkey" -> "supp"),
      "events" -> Seq("event_id" -> "ev", "user_id" -> "user"),
      "documents" -> Seq("doc_id" -> "doc"),
      "embeddings" -> Seq("vec_id" -> "doc"))
    plan.foreach { case (t, shifts) =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      val out =
        if (shifts.isEmpty || factor == 1) df
        else (0 until factor).map { i =>
          shifts.foldLeft(df) { case (d, (c, k)) =>
            d.withColumn(c,
              (col(c) + lit(i * off(k))).cast(df.schema(c).dataType))
          }
        }.reduce(_.union(_))
      out.write.mode("overwrite").parquet(s"$dstDir/$t.parquet")
    }
  }
}

/** CLI: `runMain graft.sources.ScaleUp <srcDir> <dstDir> <factor>` —
  * generates the sf1 rung locally (e.g. sf0.1 × 10). */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DataGen.scaleUp(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }
}
