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
}
