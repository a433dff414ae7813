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

  // --------------------------------------------------------------------
  // Post-execution diagnosis — the vaidya analog (ref: src/contrib/
  // vaidya/src/java/org/apache/hadoop/vaidya/postexdiagnosis/
  // PostExPerformanceDiagnoser.java:1). The reference evaluates a set
  // of DiagnosticTests over one job's counters/task statistics, each
  // returning an impact in [0,1] judged against a threshold plus a
  // prescription. Here the "job" is a Spark query, task statistics
  // come from the public SparkListener API, and the rules are
  // evaluated over the per-stage task table.
  // --------------------------------------------------------------------

  /** One task's footprint inside a stage. */
  case class TaskStat(stageId: Int, job: String, durationMs: Long,
    inputBytes: Long, shuffleReadBytes: Long, shuffleWriteBytes: Long,
    spillBytes: Long, failed: Boolean)

  /** Stage/task-level collector (the counter source vaidya's
    * JobStatistics wraps): per finished task, duration and IO volumes,
    * attributed to the submitting query via the job description the
    * caller sets (`profiled` below). Pure listener — no hooks inside
    * operators. */
  class TaskProfiler extends org.apache.spark.scheduler.SparkListener {
    private val stageJob = mutable.Map[Int, String]()
    private val buf = mutable.ArrayBuffer[TaskStat]()

    def tasks: Seq[TaskStat] = buf.synchronized(buf.toVector)
    def clear(): Unit = buf.synchronized { buf.clear(); stageJob.clear() }

    override def onStageSubmitted(
      e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
      buf.synchronized {
        stageJob(e.stageInfo.stageId) = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
      }

    override def onTaskEnd(
      e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      val stat = TaskStat(
        e.stageId,
        buf.synchronized(stageJob.getOrElse(e.stageId, "")),
        // duration throws on never-finished tasks (e.g. killed before
        // launch completes) — record 0 rather than die in the listener
        if (e.taskInfo.finishTime > 0) e.taskInfo.duration else 0L,
        if (m == null) 0L else m.inputMetrics.bytesRead,
        if (m == null) 0L else m.shuffleReadMetrics.totalBytesRead,
        if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten,
        if (m == null) 0L
        else m.memoryBytesSpilled + m.diskBytesSpilled,
        !e.taskInfo.successful)
      buf.synchronized { buf += stat }
    }
  }

  def attachProfiler(spark: SparkSession): TaskProfiler = {
    val p = new TaskProfiler
    spark.sparkContext.addSparkListener(p)
    p
  }

  def detachProfiler(spark: SparkSession, p: TaskProfiler): Unit =
    spark.sparkContext.removeSparkListener(p)

  /** Run `body` under a job description so the profiler attributes its
    * stages to `name` (vaidya's per-job scoping). */
  def profiled[T](spark: SparkSession, name: String)(body: => T): T = {
    spark.sparkContext.setJobDescription(name)
    try body finally spark.sparkContext.setJobDescription(null)
  }

  /** The per-stage task table the rules read: one row per stage with
    * task-count, duration and IO distribution facts. Driver-side build
    * over listener state — stage counts, not data rows. */
  def stageTable(spark: SparkSession, p: TaskProfiler): DataFrame = {
    import spark.implicits._
    p.tasks.groupBy(t => (t.stageId, t.job)).toSeq.map {
      case ((sid, job), ts) =>
        val ok = ts.filterNot(_.failed)
        val read = ok.map(t => t.inputBytes + t.shuffleReadBytes)
        // busy tasks: fewest tasks covering >= 90% of the stage's read
        // volume (BalancedReducePartitioning's busyReducers walk)
        val totalRead = read.sum
        val busy =
          if (totalRead == 0) ok.size
          else {
            var acc = 0L
            read.sortBy(-_).takeWhile { b =>
              val need = acc < math.ceil(totalRead * 0.9).toLong
              acc += b; need
            }.size
          }
        (job, sid, ts.size.toLong, ts.count(_.failed).toLong, busy.toLong,
          totalRead, ok.map(_.inputBytes).sum, ok.map(_.shuffleWriteBytes).sum,
          ok.map(_.spillBytes).sum,
          if (ok.isEmpty) 0L else ok.map(_.durationMs).max,
          if (ok.isEmpty) 0L
          else ok.map(_.durationMs).sorted.apply(ok.size / 2))
    }.toDF("job", "stage_id", "n_tasks", "n_failed", "busy_tasks",
      "read_bytes", "input_bytes", "shuffle_write_bytes", "spill_bytes",
      "max_task_ms", "median_task_ms")
  }

  /** Evaluate the diagnostic rules over a stage table, one finding per
    * (stage, rule) above threshold — impact in percent, with the
    * evidence and the prescription (the DiagnosticTest contract).
    * Rules (and their reference analogs):
    *  - `skewed_partitioning`: 1 − busy/total read-heavy tasks
    *    (BalancedReducePartitioning.java) — a few tasks hold ~all data.
    *  - `disk_spill`: spill vs shuffle-write volume
    *    (MapSideDiskSpill.java) — memory pressure in the sort path.
    *  - `task_reexecution`: failed/total tasks
    *    (MapsReExecutionImpact.java / ReducesReExecutionImpact.java).
    *  - `shuffle_amplification`: shuffle written ≫ input read — the
    *    shuffle-volume-vs-map-output signal.
    *  - `tiny_partitions`: many tasks, trivial per-task volume —
    *    scheduling overhead dominates.
    * All expressed as one declarative query over the stage table, so
    * diagnosis over a month of persisted traces distributes like any
    * other analytics. */
  def diagnose(stages: DataFrame, impactPctThreshold: Int = 50,
    minTasks: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    val s = stages
    def finding(rule: String, impactPct: org.apache.spark.sql.Column,
      evidence: org.apache.spark.sql.Column, advice: String) =
      s.select(col("job"), col("stage_id"), lit(rule).as("rule"),
        impactPct.cast("bigint").as("impact_pct"), evidence.as("evidence"),
        lit(advice).as("advice"))
    val skew = finding("skewed_partitioning",
      when(col("n_tasks") >= minTasks && col("read_bytes") > 0,
        lit(100) - col("busy_tasks") * 100 / col("n_tasks"))
        .otherwise(lit(0)),
      concat(col("busy_tasks"), lit(" of "), col("n_tasks"),
        lit(" tasks hold 90% of "), col("read_bytes"), lit(" bytes")),
      "repartition on a higher-cardinality key, salt the hot key, or " +
        "enable AQE skew-join handling")
    val spill = finding("disk_spill",
      when(col("shuffle_write_bytes") + col("spill_bytes") > 0,
        col("spill_bytes") * 100 /
          (col("shuffle_write_bytes") + col("spill_bytes")))
        .otherwise(lit(0)),
      concat(col("spill_bytes"), lit(" bytes spilled vs "),
        col("shuffle_write_bytes"), lit(" shuffled")),
      "raise executor memory / spark.sql.shuffle.partitions so " +
        "partitions fit, or pre-aggregate before the exchange")
    val reexec = finding("task_reexecution",
      when(col("n_tasks") > 0, col("n_failed") * 100 / col("n_tasks"))
        .otherwise(lit(0)),
      concat(col("n_failed"), lit(" of "), col("n_tasks"),
        lit(" tasks failed and re-ran")),
      "investigate task failures (OOM, bad node) — re-execution " +
        "multiplies stage cost")
    val amp = finding("shuffle_amplification",
      when(col("input_bytes") > 0,
        least(lit(100), (col("shuffle_write_bytes") - col("input_bytes"))
          * 100 / col("input_bytes")))
        .otherwise(lit(0)),
      concat(col("shuffle_write_bytes"), lit(" bytes shuffled from "),
        col("input_bytes"), lit(" bytes read")),
      "aggregate or project before the shuffle (map-side combine), or " +
        "broadcast the small side instead of exchanging the large one")
    val tiny = finding("tiny_partitions",
      when(col("n_tasks") >= minTasks &&
        col("read_bytes") / col("n_tasks") < 1048576 &&
        col("median_task_ms") < 50, lit(100).cast("bigint"))
        .otherwise(lit(0)),
      concat(col("n_tasks"), lit(" tasks over "), col("read_bytes"),
        lit(" bytes — "), (col("read_bytes") / greatest(col("n_tasks"),
          lit(1))), lit(" bytes/task")),
      "coalesce to fewer partitions (or raise maxPartitionBytes) — " +
        "per-task overhead dominates at this volume")
    skew.unionByName(spill).unionByName(reexec).unionByName(amp)
      .unionByName(tiny)
      .filter(col("impact_pct") >= impactPctThreshold)
  }
}
