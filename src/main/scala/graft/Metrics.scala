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

  /** Persist a job trace for later analysis — the job-history-log
    * role rumen parses (ref: src/tools/org/apache/hadoop/tools/rumen/
    * TraceBuilder.java:1). Parquet, so a month of traces analyzes
    * distributed like any other table. */
  def writeTrace(trace: DataFrame, path: String): Unit =
    trace.write.mode("append").parquet(path)

  def loadTrace(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Rumen's workload model (ref: .../rumen/ZombieJob.java:1, the
    * statistical job model gridmix replays): per query class, the
    * observed mix share and the duration/IO distributions — quartile
    * + tail CDF points via the mergeable approx-percentile aggregate,
    * so the model computes in one distributed pass over any amount of
    * trace. */
  def workloadModel(trace: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val total = trace.filter(!col("failed")).count().toDouble
    trace.filter(!col("failed"))
      .groupBy("query")
      .agg(
        count(lit(1)).as("runs"),
        (count(lit(1)) / lit(math.max(total, 1.0))).as("mix_share"),
        expr("percentile_approx(duration_ms, array(0.25, 0.5, 0.75, 0.95))")
          .as("duration_cdf_ms"),
        avg("duration_ms").as("mean_ms"),
        max("duration_ms").as("max_ms"),
        avg("rows").as("mean_rows"),
        avg("shuffle_bytes").as("mean_shuffle_bytes"))
  }

  /** Gridmix's replay schedule (ref: src/contrib/gridmix): a
    * deterministic synthetic workload of `n` slots whose query mix
    * matches the trace — largest-remainder apportionment, then a
    * round-robin interleave so load spreads instead of running each
    * class as a block. Returns (slot, query, expected_ms); a harness
    * submits SparkEntry.queries(query) per slot to replay production
    * shape against a new cluster/config. */
  def replaySchedule(spark: SparkSession, model: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    val classes = model.select("query", "mix_share", "mean_ms")
      .collect() // model is one row per query CLASS — inherently tiny
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(classes.nonEmpty || n == 0, "replaySchedule: empty workload model")
    // a filtered/partial model's shares need not sum to 1 — renormalize
    // so apportionment always hands out exactly n slots (shares summing
    // to 0.5 would otherwise leave half the slots unassigned and the
    // interleave below spinning forever)
    val shareSum = classes.map(_._2).sum
    val normed =
      if (shareSum > 0) classes.map { case (q, s, ms) => (q, s / shareSum, ms) }
      else classes.map { case (q, _, ms) => (q, 1.0 / classes.length, ms) }
    val exact = normed.map { case (q, share, ms) => (q, share * n, ms) }
    val floors = exact.map { case (q, e, ms) => (q, e.toInt, e - e.toInt, ms) }
    val remainder = n - floors.map(_._2).sum
    val bumped = floors.sortBy { case (q, _, frac, _) => (-frac, q) }
      .zipWithIndex
      .map { case ((q, fl, _, ms), i) => (q, fl + (if (i < remainder) 1 else 0), ms) }
    // round-robin interleave: emit one slot per class per pass
    val queues = mutable.Map(bumped.map { case (q, c, ms) => q -> (c, ms) }.toSeq: _*)
    val order = bumped.map(_._1)
    val slots = mutable.ArrayBuffer[(Int, String, Double)]()
    var progressed = true
    while (slots.size < n && progressed) {
      // progress check: a pass that adds nothing means the queues are
      // drained — never spin (belt-and-braces under renormalization)
      val before = slots.size
      order.foreach { q =>
        val (left, ms) = queues(q)
        if (left > 0 && slots.size < n) {
          slots += ((slots.size, q, ms))
          queues(q) = (left - 1, ms)
        }
      }
      progressed = slots.size > before
    }
    slots.toSeq.toDF("slot", "query", "expected_ms")
  }

  /** GridMixRunner analog (ref: src/contrib/gridmix/src/java/org/
    * apache/hadoop/mapred/GridMixRunner.java:1): EXECUTE a replay
    * schedule — the piece that turns the model into measured numbers.
    * Each slot becomes a deterministic synthetic aggregate whose input
    * row count scales with the slot's expected duration (the reference
    * sizes its synthetic jobs from the trace's byte/record counts the
    * same way); `poolFor` routes each query class to a FAIR scheduler
    * pool, and `parallelism` submitter threads keep the pools
    * contended the way gridmix's concurrent submission does. The
    * result is the replay's own job history — (query, duration_ms,
    * failed, rows, shuffle_bytes) plus slot and pool — so it feeds
    * straight back into `workloadModel` to compare replayed mix
    * against the model (the gridmix verification loop).
    *
    * The schedule is n slots — driver-side submission by design, like
    * the reference's runner; the WORK is distributed. */
  def replayRun(spark: SparkSession, schedule: DataFrame,
    poolFor: String => String = _ => "default",
    parallelism: Int = 4,
    rowsPerMs: Long = 50000L): DataFrame = {
    import spark.implicits._
    val slots = schedule.select("slot", "query", "expected_ms").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, String, Long, Boolean, Long, Long)]()
    val exec = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, parallelism))
    try {
      slots.foreach { case (slot, q, expMs) =>
        exec.submit(new Runnable { def run(): Unit = {
          val p = poolFor(q)
          val rows = math.max(1L, (expMs * rowsPerMs).toLong)
          val t0 = System.nanoTime()
          try {
            val got = Scheduling.runInPool(spark, p) {
              spark.range(rows)
                .selectExpr("count(id) AS c", "sum(id * id) AS s")
                .collect()(0).getLong(0)
            }
            results.add((slot, q, p, (System.nanoTime() - t0) / 1000000L,
              false, got, 0L))
          } catch { case scala.util.control.NonFatal(_) =>
            results.add((slot, q, p, 0L, true, 0L, 0L))
          }
        }})
      }
    } finally {
      exec.shutdown()
      exec.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
    }
    import scala.jdk.CollectionConverters._
    results.asScala.toSeq.sortBy(_._1)
      .toDF("slot", "query", "pool", "duration_ms", "failed", "rows",
        "shuffle_bytes")
  }
}
