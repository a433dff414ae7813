package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  private def await(cond: => Boolean, ms: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("listener records per-query engine metrics like the reference's counters") {
    val l = Metrics.attach(spark)
    try {
      val n = Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag").agg(count(lit(1))).collect().length
      assert(n > 0)
      assert(await(l.stats.nonEmpty), "listener should observe the query")
      val s = l.stats.last
      assert(!s.failed)
      assert(s.rows > 0, s"engine row metrics should be collected: ${s.metrics}")
      // a groupBy shuffles: the exchange write metrics must be visible
      assert(s.metrics.keys.exists(_.contains("shuffle")), s.metrics.keys.toSeq)
    } finally Metrics.detach(spark, l)
  }

  test("trace -> workload model -> replay schedule (rumen/gridmix analog)") {
    import spark.implicits._
    // a synthetic month of traces: two query classes, 3:1 mix
    val trace = (Seq.tabulate(30)(i => ("q_big", 1000L + i * 10, false,
      1000L, 1L << 20)) ++
      Seq.tabulate(10)(i => ("q_small", 100L + i, false, 10L, 1024L)) ++
      Seq(("q_big", 0L, true, 0L, 0L))) // failures are excluded
      .toDF("query", "duration_ms", "failed", "rows", "shuffle_bytes")
    val dir = tmpDir() + "/trace"
    Metrics.writeTrace(trace, dir)
    Metrics.writeTrace(trace, dir) // append mode accumulates runs
    val model = Metrics.workloadModel(Metrics.loadTrace(spark, dir))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(model("q_big").getLong(1) === 60 && model("q_small").getLong(1) === 20)
    assert(math.abs(model("q_big").getDouble(2) - 0.75) < 1e-9, "mix share")
    val cdf = model("q_big").getSeq[Long](3)
    assert(cdf.length === 4 && cdf.head >= 1000L && cdf.last <= 1290L &&
      cdf === cdf.sorted, "quartile+tail CDF inside observed range, monotone")
    // replay: 8 slots apportion 6:2 and interleave, never a block
    val sched = Metrics.replaySchedule(spark,
      Metrics.workloadModel(Metrics.loadTrace(spark, dir)), 8).collect()
    assert(sched.length === 8)
    val mix = sched.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(mix === Map("q_big" -> 6, "q_small" -> 2))
    assert(sched.map(_.getInt(0)).toSeq === (0 until 8), "slots are dense")
    val firstPass = sched.take(2).map(_.getString(1)).toSet
    assert(firstPass === Set("q_big", "q_small"),
      "round-robin interleave spreads classes across the schedule")
  }

  test("replaySchedule terminates and renormalizes a partial model (shares << 1)") {
    import spark.implicits._
    // a filtered model: one class kept out of many, share 0.2 — the
    // apportionment must renormalize instead of spinning forever
    val partial = Seq(("q_kept", 100L, 0.2,
      Seq(10L, 20L, 30L, 40L), 25.0, 40L, 10.0, 0.0))
      .toDF("query", "runs", "mix_share", "duration_cdf_ms", "mean_ms",
        "max_ms", "mean_rows", "mean_shuffle_bytes")
    val sched = Metrics.replaySchedule(spark, partial, 5).collect()
    assert(sched.length === 5)
    assert(sched.forall(_.getString(1) === "q_kept"))
    // shares summing over 1 renormalize the same way
    val over = Seq(
      ("a", 1L, 0.9, Seq(1L), 1.0, 1L, 1.0, 0.0),
      ("b", 1L, 0.9, Seq(1L), 1.0, 1L, 1.0, 0.0))
      .toDF("query", "runs", "mix_share", "duration_cdf_ms", "mean_ms",
        "max_ms", "mean_rows", "mean_shuffle_bytes")
    val s2 = Metrics.replaySchedule(spark, over, 4).collect()
    assert(s2.length === 4)
    assert(s2.groupBy(_.getString(1)).view.mapValues(_.length).toMap ===
      Map("a" -> 2, "b" -> 2))
  }

  test("gridmix loop closes: trace -> model -> replayRun through FAIR pools -> measured mix") {
    import spark.implicits._
    val trace = (Seq.tabulate(30)(i => ("q_big", 40L + i, false, 1000L, 1L << 20)) ++
      Seq.tabulate(10)(i => ("q_small", 4L + i, false, 10L, 1024L)))
      .toDF("query", "duration_ms", "failed", "rows", "shuffle_bytes")
    val model = Metrics.workloadModel(trace)
    val sched = Metrics.replaySchedule(spark, model, 8)
    // route classes to distinct pools and actually RUN the slots
    val measured = Metrics.replayRun(spark, sched,
      poolFor = q => if (q == "q_big") "etl" else "adhoc",
      parallelism = 2, rowsPerMs = 2000L)
    val rows = measured.collect()
    assert(rows.length === 8, "every slot must run exactly once")
    assert(rows.forall(!_.getBoolean(4)), "no synthetic job may fail")
    assert(rows.map(_.getInt(0)).sorted.toSeq === (0 until 8), "slots dense")
    // pool routing held per class
    assert(rows.filter(_.getString(1) == "q_big").forall(_.getString(2) == "etl"))
    assert(rows.filter(_.getString(1) == "q_small").forall(_.getString(2) == "adhoc"))
    // the measured history feeds the SAME model builder: replayed mix
    // equals the model's shares (6:2 over 8 slots = 0.75/0.25 exactly,
    // count-apportioned so zero tolerance needed)
    val remodel = Metrics.workloadModel(
      measured.select("query", "duration_ms", "failed", "rows", "shuffle_bytes"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(remodel("q_big") - 0.75) < 1e-9)
    assert(math.abs(remodel("q_small") - 0.25) < 1e-9)
    // sized-from-the-model: the big class got proportionally more input
    val meanRows = rows.groupBy(_.getString(1)).view
      .mapValues(g => g.map(_.getLong(5)).sum / g.length).toMap
    assert(meanRows("q_big") > meanRows("q_small") * 5,
      s"synthetic sizing must track expected_ms: $meanRows")
  }

  test("history() exposes the job-history table") {
    val l = Metrics.attach(spark)
    try {
      Tables.nation(spark, sfDir).count()
      assert(await(l.stats.nonEmpty))
      val h = Metrics.history(spark, l)
      assert(h.columns.toSeq ===
        Seq("query", "duration_ms", "failed", "rows", "shuffle_bytes"))
      assert(h.count() >= 1)
    } finally Metrics.detach(spark, l)
  }

  test("diagnose: an induced skewed shuffle trips the skew rule, a balanced one doesn't") {
    import org.apache.spark.sql.functions._
    val p = Metrics.attachProfiler(spark)
    try {
      // skewed: every row hashes to ONE of 32 shuffle partitions
      Metrics.profiled(spark, "skewed_job") {
        spark.range(200000).withColumn("k", lit(1L))
          .repartition(32, col("k"))
          .agg(sum("id")).collect()
      }
      // balanced control: uniform key, same shape
      Metrics.profiled(spark, "balanced_job") {
        spark.range(200000).withColumn("k", col("id") % 1024)
          .repartition(32, col("k"))
          .agg(sum("id")).collect()
      }
      // listener delivery is async — wait for both jobs' task events
      assert(await(p.tasks.exists(t => t.job == "skewed_job" &&
        t.shuffleReadBytes > 0) &&
        p.tasks.exists(t => t.job == "balanced_job" && t.shuffleReadBytes > 0)))
      val stages = Metrics.stageTable(spark, p)
      val findings = Metrics.diagnose(stages).collect()
      val skewHits = findings.filter(f =>
        f.getString(2) == "skewed_partitioning")
      assert(skewHits.exists(_.getString(0) == "skewed_job"),
        s"skew rule must fire on the 1-hot-partition shuffle: " +
          s"${findings.mkString("; ")}")
      assert(!skewHits.exists(_.getString(0) == "balanced_job"),
        s"skew rule must NOT fire on the uniform shuffle: " +
          s"${skewHits.mkString("; ")}")
      // each finding carries the DiagnosticTest contract: impact above
      // threshold, evidence, and a prescription
      val hit = skewHits.find(_.getString(0) == "skewed_job").get
      assert(hit.getLong(3) >= 50 && hit.getString(4).nonEmpty &&
        hit.getString(5).nonEmpty)
    } finally Metrics.detachProfiler(spark, p)
  }

  test("diagnose: spill-free balanced work yields no findings at default thresholds") {
    import org.apache.spark.sql.functions._
    val p = Metrics.attachProfiler(spark)
    try {
      Metrics.profiled(spark, "clean_job") {
        Tables.lineitem(spark, sfDir)
          .groupBy("l_returnflag").agg(sum("l_quantity")).collect()
      }
      assert(await(p.tasks.exists(_.job == "clean_job")))
      val findings = Metrics.diagnose(Metrics.stageTable(spark, p))
        .filter(col("job") === "clean_job")
        // tiny_partitions legitimately fires at sf0.001 volumes — the
        // rule under test here is that skew/spill/reexec stay quiet
        .filter(col("rule") =!= "tiny_partitions")
        .collect()
      assert(findings.isEmpty, findings.mkString("; "))
    } finally Metrics.detachProfiler(spark, p)
  }
}
