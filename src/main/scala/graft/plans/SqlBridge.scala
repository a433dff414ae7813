package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into `private[sql]` surface: constructing a DataFrame
  * from a custom LogicalPlan (`Dataset.ofRows`) has no public
  * equivalent, and every Spark-native library that adds whole-operator
  * plans (logical node + strategy) needs exactly this one call. Kept to
  * a single forwarding object in a dedicated package so the private-API
  * footprint is auditable.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-tag a batch DataFrame as a streaming one — the call every V1
    * streaming `Source.getBatch` needs (MicroBatchExecution asserts
    * `isStreaming=true` on the returned frame) and that, like
    * `ofRows`, has no public equivalent. Same approach as the
    * well-known open lakehouse connectors: evaluate the batch plan to
    * its InternalRow RDD and wrap it in a streaming-tagged LogicalRDD. */
  def streamingFromBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse re-tag, for V1 streaming SINKS: `Sink.addBatch`
    * receives a frame planned by the incremental execution, which a
    * batch writer (DataFrameWriter) refuses; wrap its InternalRow RDD
    * as a plain batch frame so the ordinary write path applies. */
  def batchFromStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
