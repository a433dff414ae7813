package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hadoop Streaming re-expressed: pipe rows through an external
  * executable, one line per record (ref: src/contrib/streaming/src/
  * java/org/apache/hadoop/streaming/PipeMapper.java:1,
  * PipeReducer.java:1). The process runs once per partition — the
  * same fan-out as the reference's one-process-per-task — so it
  * scales with the partition count, not the row count.
  */
object Pipe {

  /** Pipe a single-string-column DataFrame through `cmd` line-by-line. */
  def pipeLines(spark: SparkSession, lines: DataFrame, cmd: Seq[String]): DataFrame = {
    import spark.implicits._
    val piped = lines.as[String].rdd.pipe(cmd)
    spark.createDataset(piped).toDF("line")
  }

  /** Demo/oracle query: uppercase documents through `tr` and parse the
    * TSV back. The text is pre-cleaned to printable ASCII so the
    * external tool and the SQL oracle (upper()) agree exactly. */
  def pipeUpper(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.documents(spark, dir).select(
      concat(col("doc_id").cast("string"), lit("\t"),
        expr("substring(regexp_replace(text, '[^ -~]', ''), 1, 60)")).as("line"))
    pipeLines(spark, lines, Seq("tr", "[:lower:]", "[:upper:]"))
      .select(split(col("line"), "\t").as("f"))
      .select(expr("cast(f[0] as bigint)").as("doc_id"),
        expr("coalesce(f[1], '')").as("up"))
  }
}
