package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MultipleOutputs / MultipleOutputFormat re-expressed (ref: src/
  * mapred/org/apache/hadoop/mapred/lib/MultipleOutputs.java:1,
  * MultipleOutputFormat.java:1): route rows to per-key output files.
  * `partitionBy` writes one directory per key value with Hive-style
  * layout, which also gives readers partition pruning for free —
  * the 100 TB read path skips non-matching directories entirely.
  */
object PartitionedWriter {

  def write(df: DataFrame, path: String, keys: Seq[String],
    codec: String = "zstd"): Unit =
    df.write.mode("overwrite")
      .option("compression", codec)
      .partitionBy(keys: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
