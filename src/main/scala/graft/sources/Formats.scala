package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Additional warehouse formats and resilient reads.
  *
  *  - ORC: the columnar successor of the reference's
  *    SequenceFile/RCFile lineage; Spark's native source with
  *    pushdown and pruning.
  *  - Permissive/bad-record handling (ref: src/mapred/org/apache/
  *    hadoop/mapred/SkipBadRecords.java:1 — skip ranges around
  *    crashing records): Spark's declarative equivalents are
  *    PERMISSIVE parse mode with a corrupt-record column for malformed
  *    rows, and `ignoreCorruptFiles` for unreadable files — same
  *    keep-the-job-alive semantics without task re-execution.
  *  - CSV: the reference's record IO text form (ref: src/core/org/
  *    apache/hadoop/record/CsvRecordInput.java:1); schemas are
  *    StructTypes (the record-DDL analog).
  */
object Formats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** CSV with explicit schema; malformed rows land in `_corrupt`
    * instead of failing the job. */
  def readCsvPermissive(spark: SparkSession, path: String,
    ddl: String): DataFrame =
    spark.read
      .schema(ddl + ", _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Parquet scan that skips unreadable files instead of aborting.
    * The option is scoped to THIS read — session conf stays untouched,
    * so other reads in the same session still fail fast on corruption. */
  def readParquetResilient(spark: SparkSession, path: String): DataFrame =
    spark.read.option("ignoreCorruptFiles", "true").parquet(path)
}
