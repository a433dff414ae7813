package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source — DBInputFormat/DBOutputFormat re-expressed (ref:
  * src/mapred/org/apache/hadoop/mapred/lib/db/DBInputFormat.java:1,
  * DBOutputFormat.java:1). Spark's JDBC source gives the same
  * split-by-key parallel read the reference implements by paging with
  * LIMIT/OFFSET per task — `partitionColumn/lowerBound/upperBound/
  * numPartitions` issues one range query per partition, and filters
  * push down to the database as WHERE clauses.
  */
object Jdbc {

  /** Parallel partitioned read: one JDBC query per id-range split. */
  def read(spark: SparkSession, url: String, table: String,
    partitionColumn: String, lower: Long, upper: Long,
    numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  def write(df: DataFrame, url: String, table: String): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode("append")
      .save()
}
