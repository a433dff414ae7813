package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the warehouse star schema (TESTDATA.md).
  *
  * Loads are plain parquet scans so Catalyst column pruning and filter
  * pushdown reach the file source (`PushedFilters`/`ReadSchema` in
  * `.explain`). At cluster scale the same call reads HDFS through the
  * standard Hadoop connectors — the storage integration the reference
  * provides natively (ref: src/core/org/apache/hadoop/fs,
  * src/hdfs).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so users can drive the whole
    * engine through `spark.sql(...)` — the warehouse-SQL surface the
    * reference's users reach through Hive. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Text source with explicit split sizing — the NLineInputFormat /
    * CombineFileInputFormat control surface (ref: src/mapred/org/
    * apache/hadoop/mapred/lib/NLineInputFormat.java:1,
    * CombineFileInputFormat.java:1): `maxPartitionBytes` bounds split
    * size (combine small files up / split big files down);
    * `minPartitionNum` forces enough splits for full parallelism. */
  def readText(s: SparkSession, path: String,
    maxPartitionBytes: Long = 128L * 1024 * 1024,
    minPartitions: Int = 0): DataFrame = {
    // Split-size confs are read from the session at PLAN time and have
    // no per-read option, so scope them to a child session (shared
    // SparkContext, independent SQLConf) instead of mutating the
    // caller's session for all subsequent reads.
    val scoped = s.newSession()
    scoped.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
    if (minPartitions > 0)
      scoped.conf.set("spark.sql.files.minPartitionNum", minPartitions.toString)
    scoped.read.text(path)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across data drops:
    * TIMESTAMP(NANOS) (no native Spark type — read nanos as long and
    * rebuild a micros timestamp, the same truncation DuckDB applies),
    * plain int64 nanos (the scaled-rung layout DataGen.scaleUp writes),
    * and native TIMESTAMP(MICROS). Adapt on the schema actually read so
    * every layout lands on session-zoned TimestampType. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // native micros (NTZ under the vectorized reader); session tz is
        // UTC so the cast is value-identical to what DuckDB reads
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
