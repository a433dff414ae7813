package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SequenceFile source/sink (ref: src/core/org/apache/hadoop/io/
  * SequenceFile.java:1) — the reference's workhorse container format.
  * Spark's Hadoop-IO integration reads and writes it natively; the
  * warehouse uses it for key-value intermediate data.
  */
object SeqFiles {

  /** Write a (key,value) string pair DataFrame as a SequenceFile. */
  def write(df: DataFrame, path: String): Unit =
    df.rdd.map(r => (r.get(0).toString, r.get(1).toString))
      .saveAsSequenceFile(path)

  /** Read a string SequenceFile back as a (key, value) DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](path).toDF("key", "value")
  }

  /** Read through the DataSourceV2 provider (SeqFileSource): a real
    * `spark.read.format(...)` table with schema and per-file input
    * partitions, not an RDD wrapper. */
  def readV2(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-seqfile").load(path)

  /** Write through the DSv2 provider (append mode; executor tasks
    * stream part files directly). */
  def writeV2(df: DataFrame, path: String): Unit =
    df.write.format("graft-seqfile").mode("append").save(path)
}
