package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query metrics collection — the engine-side analog of the
  * reference's Counters + job history (ref: src/mapred/org/apache/
  * hadoop/mapred/Counters.java:1, JobHistory.java:1; the vaidya
  * contrib diagnoses jobs from exactly these counters). Spark already
  * meters every physical operator; this listener aggregates those SQL
  * metrics per query through the public QueryExecutionListener API —
  * no instrumentation in the operators themselves.
  *
  * `observe()`/`Observation` (SourcesSpec) covers user-defined
  * counters; this covers the engine-maintained ones.
  */
object Metrics {

  /** One finished query: name, wall time, and the sum of each SQL
    * metric over all plan nodes (AQE subtrees included). */
  case class QueryStats(
    name: String,
    durationMs: Long,
    failed: Boolean,
    metrics: Map[String, Long]) {
    def rows: Long = metrics.getOrElse("number of output rows", 0L)
    def shuffleBytes: Long = metrics.getOrElse("shuffle bytes written", 0L)
    def spillBytes: Long = metrics.getOrElse("spill size", 0L)
  }

  class Listener extends QueryExecutionListener {
    private val buf = mutable.ArrayBuffer[QueryStats]()

    def stats: Seq[QueryStats] = buf.synchronized(buf.toVector)
    def clear(): Unit = buf.synchronized(buf.clear())

    private def collectMetrics(qe: QueryExecution): Map[String, Long] = {
      val acc = mutable.Map[String, Long]().withDefaultValue(0L)
      // ReusedExchangeExec points at an exchange instance that is also
      // reachable through its original subtree — an identity set keeps
      // each node's (shared) metric accumulators counted exactly once
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
      def walk(p: SparkPlan): Unit = if (seen.add(p)) {
        p.metrics.foreach { case (_, m) =>
          if (m.value > 0) acc(m.name.getOrElse("metric")) += m.value
        }
        // AQE wraps executed subtrees in leaf nodes: unwrap them all
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case s: QueryStageExec => walk(s.plan)
          case r: ReusedExchangeExec => walk(r.child)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(qe.executedPlan)
      acc.toMap
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      buf.synchronized {
        buf += QueryStats(funcName, durationNs / 1000000L, failed = false,
          collectMetrics(qe))
      }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      buf.synchronized {
        buf += QueryStats(funcName, 0L, failed = true, Map.empty)
      }
  }

  /** Attach a fresh listener to the session; returns it for readback. */
  def attach(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: Listener): Unit =
    spark.listenerManager.unregister(l)

  /** The job-history table: one row per finished query. */
  def history(spark: SparkSession, l: Listener): DataFrame = {
    import spark.implicits._
    l.stats.map(s => (s.name, s.durationMs, s.failed, s.rows, s.shuffleBytes))
      .toDF("query", "duration_ms", "failed", "rows", "shuffle_bytes")
  }
}
