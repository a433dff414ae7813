package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Streams, Windows}

class StreamsSpec extends SparkSpec {

  test("streaming windowedCounts matches the batch windowAgg semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Streams.Event]
    val events = Seq(
      Streams.Event(1, Timestamp.valueOf("2024-01-01 00:10:00"), 1, "click", 1.0),
      Streams.Event(2, Timestamp.valueOf("2024-01-01 00:50:00"), 1, "click", 2.0),
      Streams.Event(3, Timestamp.valueOf("2024-01-01 01:10:00"), 2, "view", 3.0))
    input.addData(events: _*)
    val q = Streams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("wc").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === Set(
      ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 01:00:00.0", "view", 1L, 3.0)))
  }

  test("streaming sessionize emits a session once the 30-min gap passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Streams.Event]
    input.addData(
      Streams.Event(1, Timestamp.valueOf("2024-01-01 00:00:00"), 7, "click", 1.0),
      Streams.Event(2, Timestamp.valueOf("2024-01-01 00:10:00"), 7, "click", 1.0),
      Streams.Event(3, Timestamp.valueOf("2024-01-01 02:00:00"), 7, "click", 1.0))
    val q = Streams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    q.processAllAvailable()
    val first = spark.table("sess").as[Streams.SessionOut].collect()
    assert(first.length === 1)
    assert(first(0).user_id === 7 && first(0).n_events === 2)
    // Advance the watermark (05:00 - 1h = 04:00) past user 7's open
    // session timeout (02:00 + 30 min): the event-time timeout must
    // flush the idle user's final session and evict the state.
    input.addData(
      Streams.Event(4, Timestamp.valueOf("2024-01-01 05:00:00"), 8, "click", 1.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess").as[Streams.SessionOut].collect()
    assert(out.length === 2, out.mkString(", "))
    val flushed = out.filter(_.n_events == 1)
    assert(flushed.length === 1 && flushed(0).user_id === 7)
  }

  test("streaming funnel advances users greedily; stages survive across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, t: String, uid: Long, typ: String) =
      Streams.Event(id, Timestamp.valueOf(t), uid, typ, 1.0)
    val input = MemoryStream[Streams.Event]
    val q = Streams.funnelStages(input.toDS())
      .toDF("user_id", "stage")
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    // batch 1: user 1 signs up and views; user 2 only signs up; user 3
    // views WITHOUT a signup (never enters the funnel)
    input.addData(
      ev(1, "2024-01-01 00:00:00", 1, "signup"),
      ev(2, "2024-01-01 00:05:00", 1, "view"),
      ev(3, "2024-01-01 00:00:00", 2, "signup"),
      ev(4, "2024-01-01 00:00:00", 3, "view"))
    q.processAllAvailable()
    // batch 2: user 1 clicks then purchases (state carried over);
    // user 2's out-of-window view (25h later) must NOT advance
    input.addData(
      ev(5, "2024-01-01 00:10:00", 1, "click"),
      ev(6, "2024-01-01 00:15:00", 1, "purchase"),
      ev(7, "2024-01-02 01:00:00", 2, "view"))
    q.processAllAvailable(); q.stop()
    val latest = spark.table("funnel").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
    assert(latest === Map(1L -> 4, 2L -> 1), s"got $latest")
  }

  test("streaming funnel equals the batch greedy funnel on the real events table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // real events, truncated to millis so both sides see identical times
    val events = graft.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.Event]
    input.addData(events: _*)
    val q = Streams.funnelStages(input.toDS())
      .toDF("user_id", "stage")
      .writeStream.format("memory").queryName("funnel_eq")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("funnel_eq").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    // batch greedy over the SAME millis-truncated rows (the Olap.funnel
    // formulation, parameterized by this data)
    events.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("fev")
    val w = 86400000000L
    val batch = spark.sql(
      s"""WITH ev AS (SELECT user_id, event_type, unix_micros(ts) t FROM fev),
         |s1 AS (SELECT user_id, min(t) t1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(t) t2 FROM ev e JOIN s1 USING (user_id)
         |       WHERE event_type = 'view' AND t > t1 AND t <= t1 + $w GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(t) t3 FROM ev e JOIN s2 USING (user_id)
         |       WHERE event_type = 'click' AND t > t2 AND t <= t2 + $w GROUP BY 1),
         |s4 AS (SELECT e.user_id, min(t) t4 FROM ev e JOIN s3 USING (user_id)
         |       WHERE event_type = 'purchase' AND t > t3 AND t <= t3 + $w GROUP BY 1)
         |SELECT s1.user_id,
         |  CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3
         |       WHEN t2 IS NOT NULL THEN 2 ELSE 1 END stage
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |LEFT JOIN s4 USING (user_id)""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed === batch,
      "streaming greedy funnel must equal the batch formulation per user")
    assert(batch.values.exists(_ >= 3), "some users should reach deep stages")
  }

  test("streaming attribution equals the batch window models on the real events table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = graft.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.Event]
    input.addData(events: _*)
    val q = Streams.attributionFacts(input.toDS())
      .toDF("event_id", "first_ch", "last_ch", "cents")
      .writeStream.format("memory").queryName("attr_eq")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val facts = spark.table("attr_eq").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    // batch twin over the SAME millis-truncated rows
    events.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("aev")
    val batch = spark.sql(
      """WITH ev AS (SELECT event_id, ts, user_id, event_type,
        |    cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT) cents,
        |    CASE WHEN event_type IN ('click','view') THEN event_type END touch
        |  FROM aev),
        |att AS (SELECT event_id, event_type, cents,
        |    first(touch, true) OVER w first_touch,
        |    last(touch, true) OVER w last_touch
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, coalesce(first_touch, 'direct') f,
        |       coalesce(last_touch, 'direct') l, cents
        |FROM att WHERE event_type = 'purchase'""".stripMargin).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(facts === batch,
      "per-purchase streamed credit must equal the batch window models")
    assert(facts.nonEmpty && facts.values.exists(_._1 != "direct"))
  }

  test("daily twins drop late events for closed days instead of re-emitting them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, day: String, v: Double) =
      Streams.Event(id, Timestamp.valueOf(s"$day 12:00:00"), 1, "t", v)
    val input = MemoryStream[Streams.Event]
    val q = Streams.cusumDaily(input.toDS(), Map("t" -> (0L, 1000000L)))
      .writeStream.format("memory").queryName("lateout")
      .outputMode("append").start()
    try {
      // day 1 and day 2 arrive; day 1 closes and emits
      input.addData(ev(1, "2024-01-01", 10.0), ev(2, "2024-01-02", 20.0))
      q.processAllAvailable()
      // a LATE day-1 event in a later micro-batch: Append mode already
      // emitted day 1 — reopening it would duplicate the day row
      input.addData(ev(3, "2024-01-01", 99.0), ev(4, "2024-01-03", 30.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT _2, _3 FROM lateout").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(rows.count(_._1 == "2024-01-01") === 1,
        s"closed day re-emitted: ${rows.toSeq}")
      assert(rows.toMap === Map("2024-01-01" -> 1000L, "2024-01-02" -> 2000L),
        "the late event must not contaminate any day sum")
    } finally q.stop()
  }

  test("streaming cusum equals the batch recursion against fixed baselines") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = graft.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // batch pass profiles the same series into per-type baselines
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val daily = events.groupBy(e => (e.event_type, fmt.format(e.ts)))
      .map { case (k, es) => k -> es.map(e =>
        (BigDecimal(e.value).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum }
    val baselines = daily.groupBy(_._1._1).map { case (t, m) =>
      val xs = m.values.toSeq
      val tgt = xs.sum / xs.length
      t -> (tgt, 3L * xs.map(x => math.abs(x - tgt)).sum / xs.length)
    }
    val input = MemoryStream[Streams.Event]
    input.addData(events: _*)
    val q = Streams.cusumDaily(input.toDS(), baselines)
      .toDF("event_type", "day", "cents", "cusum_cents", "alarm")
      .writeStream.format("memory").queryName("cusum_eq")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cusum_eq").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val expected = daily.groupBy(_._1._1).flatMap { case (t, m) =>
      val (tgt, h) = baselines(t)
      val days = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
      var sAcc = 0L
      days.map { case (d, x) =>
        sAcc = math.max(0L, sAcc + (x - tgt))
        (t, d) -> ((x, sAcc, sAcc > h))
      }.dropRight(1) // final day still open in state
    }
    assert(streamed === expected,
      "completed-day streamed cusum must equal the batch recursion")
  }

  test("streaming ewma equals the batch recursion on every completed day") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = graft.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.Event]
    input.addData(events: _*)
    val q = Streams.ewmaDaily(input.toDS())
      .toDF("event_type", "day", "cents", "ewma_cents")
      .writeStream.format("memory").queryName("ewma_eq")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ewma_eq").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // the same recursion folded over the SAME rows (the typed stream
    // filters null users, so fold in-test rather than vs Olap.ewma);
    // streaming emits every day except each type's final (open) one
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val daily = events.groupBy(e => (e.event_type, fmt.format(e.ts)))
      .map { case (k, es) => k -> es.map(e =>
        (BigDecimal(e.value).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum }
    val expected = daily.groupBy(_._1._1).flatMap { case (t, m) =>
      val days = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
      var e = 0L
      val folded = days.zipWithIndex.map { case ((d, x), i) =>
        e = if (i == 0) x else (x + 3 * e) / 4
        (t, d) -> ((x, e))
      }
      folded.dropRight(1) // final day still open in state
    }
    assert(streamed === expected,
      "completed-day streamed ewma must equal the batch recursion")
    assert(streamed.nonEmpty)
  }

  test("streaming holt equals the batch recursion on every completed day") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = graft.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streams.Event]
    input.addData(events: _*)
    val q = Streams.holtDaily(input.toDS())
      .toDF("event_type", "day", "cents", "level", "trend", "forecast")
      .writeStream.format("memory").queryName("holt_eq")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("holt_eq").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val daily = events.groupBy(e => (e.event_type, fmt.format(e.ts)))
      .map { case (k, es) => k -> es.map(e =>
        (BigDecimal(e.value).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum }
    val expected = daily.groupBy(_._1._1).flatMap { case (t, m) =>
      val days = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
      var l = 0L; var b = 0L
      val folded = days.zipWithIndex.map { case ((d, x), i) =>
        if (i == 0) { l = x; b = 0L }
        else { val l2 = (x + l + b) / 2; b = ((l2 - l) + b) / 2; l = l2 }
        (t, d) -> ((x, l, b, l + b))
      }
      folded.dropRight(1) // final day still open in state
    }
    assert(streamed === expected,
      "completed-day streamed holt must equal the batch recursion")
    assert(streamed.nonEmpty)
  }

  test("ewma truncates (not floors) on negative daily sums, matching DuckDB //") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Streams.Event]
    // day1 sums to -101 cents, day2 to 50; e2 = (50 + 3*(-101)) / 4
    // = -253 / 4 = -63 under truncation — DuckDB's actual // semantics
    // (measured: -5 // 2 = -2); floorDiv would emit -64 and diverge
    input.addData(
      Streams.Event(1, Timestamp.valueOf("2024-01-01 01:00:00"), 1, "t", -1.01),
      Streams.Event(2, Timestamp.valueOf("2024-01-02 01:00:00"), 1, "t", 0.50),
      Streams.Event(3, Timestamp.valueOf("2024-01-03 01:00:00"), 1, "t", 9.99))
    val q = Streams.ewmaDaily(input.toDS())
      .toDF("event_type", "day", "cents", "ewma_cents")
      .writeStream.format("memory").queryName("ewma_neg")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ewma_neg").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(("2024-01-01", -101L, -101L), ("2024-01-02", 50L, -63L)))
  }

  test("late data past the watermark is dropped AND the drop is observable in progress metrics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Streams.Event]
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode("update").start()
    input.addData(Streams.Event(1, Timestamp.valueOf("2024-01-01 02:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // 00:05 is far behind the 01:50 watermark: silently dropped from
    // results, but COUNTED in numRowsDroppedByWatermark — the metric an
    // operator ALERTS on (silent data loss must never be invisible)
    input.addData(Streams.Event(2, Timestamp.valueOf("2024-01-01 00:05:00"), 1, "click", 1.0))
    q.processAllAvailable()
    val dropped = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsDroppedByWatermark).sum
    q.stop()
    assert(dropped === 1L,
      s"the late row must be counted as watermark-dropped, got $dropped")
    val windows = spark.table("late").collect()
      .map(_.getStruct(0).getTimestamp(0).toString).toSet
    assert(!windows.exists(_.contains("00:00:00")),
      "the late row must not create its pre-watermark window")
  }

  test("stream-stream interval join enriches errors with recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Streams.Event]
    val errors = MemoryStream[Streams.Event]
    clicks.addData(
      Streams.Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 5, "click", 0),
      Streams.Event(2, Timestamp.valueOf("2024-01-01 08:00:00"), 5, "click", 0))
    errors.addData(
      Streams.Event(9, Timestamp.valueOf("2024-01-01 10:10:00"), 5, "error", 0))
    val q = Streams.enrichErrors(clicks.toDF(), errors.toDF())
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("enriched").collect()
    // only the 10:00 click is within 30 min of the 10:10 error
    assert(out.length === 1)
    assert(out(0).getTimestamp(3) === Timestamp.valueOf("2024-01-01 10:00:00"))
  }

  test("dropDuplicatesWithinWatermark removes repeated event ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Streams.Event]
    input.addData(
      Streams.Event(1, Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 0),
      Streams.Event(1, Timestamp.valueOf("2024-01-01 00:00:01"), 1, "click", 0),
      Streams.Event(2, Timestamp.valueOf("2024-01-01 00:00:02"), 1, "view", 0))
    val q = Streams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("followNovelty emits only novel docs and maintains the band index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = tmpDir() + "/nov-idx"
    val ckpt = tmpDir() + "/nov-ckpt"
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "totally different words are here right now yes indeed ok"
    val d = "brand new content words appear completely fresh again here"
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = graft.operators.Dedup.followNovelty(
      input.toDF().toDF("doc_id", "text"), idx, ckpt) { (novel, epoch) =>
      got ++= novel.select("doc_id").collect().map(r => epoch -> r.getLong(0))
      ()
    }
    try {
      input.addData((1L, a), (2L, b))
      q.processAllAvailable()
      assert(got.map(_._2).toSet === Set(1L, 2L),
        "an empty index accepts the whole first batch")
      // batch 2: doc 3 duplicates doc 1's text (shares every band),
      // doc 4 is novel
      input.addData((3L, a), (4L, d))
      q.processAllAvailable()
      assert(got.map(_._2).toSet === Set(1L, 2L, 4L),
        "the index must reject the near-dup and pass the novel doc")
      // the index covers exactly the accepted docs
      val indexed = graft.sources.TxTable.read(spark, idx)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(indexed === Set(1L, 2L, 4L))
    } finally q.stop()
    // an immediate replay of the accepted docs finds nothing novel:
    // the stream state is IN the table, not the checkpoint
    val ckpt2 = tmpDir() + "/nov-ckpt2"
    val input2 = MemoryStream[(Long, String)]
    val got2 = scala.collection.mutable.ArrayBuffer[Long]()
    val q2 = graft.operators.Dedup.followNovelty(
      input2.toDF().toDF("doc_id", "text"), idx, ckpt2) { (novel, _) =>
      got2 ++= novel.select("doc_id").collect().map(_.getLong(0))
      ()
    }
    try {
      input2.addData((5L, a), (6L, d))
      q2.processAllAvailable()
      assert(got2.isEmpty, "re-ingesting indexed content must emit nothing")
    } finally q2.stop()
  }

  test("followAggView maintains the view exactly-once across a restart") {
    import spark.implicits._
    import graft.sources.{TxTable, TxView}
    val base = tmpDir() + "/fav-base"
    val view = tmpDir() + "/fav-view"
    val ckpt = tmpDir() + "/fav-ckpt"
    def commit(rows: Seq[(Long, String, Long, Long, Long)]): Unit = {
      TxTable.mergeDelta(spark, base,
        rows.toDF("k", "op", "g", "v", "seq"))
      ()
    }
    commit(Seq((1L, "I", 1L, 10L, 1L), (2L, "I", 1L, 20L, 2L),
      (3L, "I", 2L, 30L, 3L)))
    def viewRows(): Set[(Long, Long, Long)] =
      TxTable.read(spark, view).select("g", "sum_v", "n_rows").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val q1 = TxView.followAggView(spark, base, view, "g", "v", ckpt)
    try {
      q1.processAllAvailable()
      assert(viewRows() === Set((1L, 30L, 2L), (2L, 30L, 1L)))
      // a live commit while the stream runs is folded in
      commit(Seq((4L, "I", 2L, 5L, 4L)))
      q1.processAllAvailable()
      assert(viewRows() === Set((1L, 30L, 2L), (2L, 35L, 2L)))
    } finally q1.stop()
    // commits while the follower is OFFLINE: an update that moves a
    // row between groups and a delete that shrinks one
    commit(Seq((2L, "U", 2L, 25L, 5L)))
    commit(Seq((3L, "D", 2L, 0L, 6L)))
    // restart from the same checkpoint — the offline window replays
    // once and ONLY once (the view's own tags gate the fold)
    val q2 = TxView.followAggView(spark, base, view, "g", "v", ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val recompute = TxTable.read(spark, base).groupBy("g")
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viewRows() === recompute,
      "restarted follower must converge to the full recompute")
    assert(viewRows() === Set((1L, 10L, 1L), (2L, 30L, 2L)))
  }

  test("foreachBatch lands micro-batches as parquet") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = tmpDir() + "/sink"
    val input = MemoryStream[Streams.Event]
    input.addData(
      Streams.Event(1, Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.0),
      Streams.Event(2, Timestamp.valueOf("2024-01-01 00:00:01"), 2, "view", 2.0))
    val q = Streams.writeBatches(input.toDF(), dir).start()
    q.processAllAvailable()
    input.addData(
      Streams.Event(3, Timestamp.valueOf("2024-01-01 00:00:02"), 3, "click", 3.0))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("stream-static join enriches a stream against a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_name"))
    val input = MemoryStream[Streams.Event]
    input.addData(
      Streams.Event(1, Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 0),
      Streams.Event(2, Timestamp.valueOf("2024-01-01 00:00:01"), 999999, "click", 0))
    val q = input.toDF().join(dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enr_static").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("enr_static").collect()
    assert(out.length === 1, "only the known user joins")
    assert(out(0).getAs[Long]("user_id") === 1L)
  }

  test("batch sessionize splits on gaps > 30 min") {
    val df = Windows.sessionize(spark, sfDir)
    assert(df.count() > 0)
    // every session's span must not contain an internal gap > 30 min:
    // sessions are maximal, so session count == distinct (user, flagged starts)
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(df.select("user_id").distinct().count() === nUsers)
  }

  test("streaming near-dup dedup on the simhash32 kernel fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData(
      (1L, t0, "the quick brown fox jumps over the lazy dog"),
      (2L, t0, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, t0, "a completely different document about spark engines"))
    val deduped = input.toDF().toDF("doc_id", "ts", "text")
      .withColumn("fp", expr("simhash32(split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' ')), ' '))"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("sdedup").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.size === 2, s"dup fingerprint must be dropped: $out")
    assert(out.contains(3L))
  }

  test("streaming CDC upsert maintains the keyed table across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = tmpDir() + "/upsert"
    val input = MemoryStream[(Long, String, Double, Long)]
    val changes = input.toDF().toDF("k", "op", "v", "seq")
    val q = Streams.upsertBatches(changes, dir).start()
    // batch 1: three inserts, with an in-batch overwrite of k=2
    input.addData((1L, "I", 10.0, 1L), (2L, "I", 20.0, 2L), (2L, "U", 25.0, 3L))
    q.processAllAvailable()
    val t1 = spark.read.parquet(dir).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(t1 === Map(1L -> 10.0, 2L -> 25.0))
    // batch 2: update k=1, delete k=2, insert k=3
    input.addData((1L, "U", 11.0, 4L), (2L, "D", 0.0, 5L), (3L, "I", 30.0, 6L))
    q.processAllAvailable(); q.stop()
    val t2 = spark.read.parquet(dir).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(t2 === Map(1L -> 11.0, 3L -> 30.0))
  }

  test("mg_topk trends items over a stream in bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // item i arrives ~ 300/i times across two micro-batches
    val all = (1 to 30).flatMap(i => Seq.fill(300 / i)(s"tag$i"))
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[String]
    val agg = input.toDF().toDF("w")
      .agg(expr("mg_topk(w, 6)").as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.est"))
    val q = agg.writeStream.format("memory").queryName("mgtrend")
      .outputMode("complete").start()
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable(); q.stop()
    val out = spark.table("mgtrend").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size <= 6)
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.size.toLong
    out.foreach { case (item, est) =>
      assert(est <= exact(item) && exact(item) - est <= n / 7,
        s"$item: est $est vs freq ${exact(item)}")
    }
    // the dominant tags survive the stream's state bound
    exact.filter(_._2 > n / 7).keys.foreach(hh =>
      assert(out.contains(hh), s"trending item $hh missing"))
  }

  test("sliding-window KMV sketch: streaming twin matches the batch windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val events = (1 to 120).map(i => Streams.Event(
      i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 28}%02d:30"),
      (i % 50).toLong, "click", 1.0))
    val input = MemoryStream[Streams.Event]
    input.addData(events: _*)
    val agg = input.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(expr("kmv_uniq(md5(cast(user_id as string)), 16)").as("s"))
      .selectExpr("date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS wstart", "s.est AS est")
    val q = agg.writeStream.format("memory").queryName("kmvwin")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("kmvwin").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = events.toDF()
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(expr("kmv_uniq(md5(cast(user_id as string)), 16)").as("s"))
      .selectExpr("date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS wstart", "s.est AS est")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamed === batch,
      "streaming sliding-window sketches must equal the batch computation")
    assert(batch.size > 2, "events should span several sliding windows")
  }

  test("kmv_uniq sketch aggregates over a stream with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[Streams.Event]
    input.addData((1 to 40).map(i =>
      Streams.Event(i.toLong, Timestamp.valueOf("2024-01-01 00:10:00"), (i % 20).toLong, "click", 1.0)): _*)
    val agg = input.toDF()
      .selectExpr("event_type", "md5(cast(user_id as string)) AS h")
      .groupBy("event_type")
      .agg(expr("kmv_uniq(h, 8)").as("s"))
      .selectExpr("event_type", "s.est AS est")
    val q = agg.writeStream.format("memory").queryName("kmv")
      .outputMode("complete").start()
    q.processAllAvailable()
    // 20 distinct users, k=8 → sketch path (not exact); estimate sane
    val est1 = spark.table("kmv").collect()(0).getDouble(1)
    assert(est1 > 5.0 && est1 < 80.0, s"est=$est1")
    // incremental batch must merge into the same bounded state
    input.addData((41 to 80).map(i =>
      Streams.Event(i.toLong, Timestamp.valueOf("2024-01-01 00:20:00"), (i % 40).toLong, "click", 1.0)): _*)
    q.processAllAvailable(); q.stop()
    val est2 = spark.table("kmv").collect()(0).getDouble(1)
    assert(est2 >= est1 * 0.8, s"est should not collapse: $est1 -> $est2")
  }

  test("windowed percentile sketch streams: hist_sketch + hist_quantile readout match batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // cents in [100, 12000): several 4096-wide buckets per window
    val events = (1 to 200).map(i => Streams.Event(
      i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 30}%02d:00"),
      i.toLong, "buy", (i * 60 % 12000 + 100).toDouble))
    val input = MemoryStream[Streams.Event]
    input.addData(events: _*)
    def sketchAgg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("cents", expr("cast(round(value, 0) as bigint)"))
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(expr("hist_sketch(cents, 4096L, 8)").as("hist"))
      .selectExpr("date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS wstart",
        "hist_quantile(hist, 0.5, 4096L) AS p50",
        "hist_quantile(hist, 0.9, 4096L) AS p90")
    val q = sketchAgg(input.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("histwin")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("histwin").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = sketchAgg(events.toDF()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed === batch,
      "streaming windowed percentile sketches must equal the batch computation")
    assert(batch.size >= 3, "events should span several windows")
    assert(batch.values.forall { case (p50, p90) => p50 <= p90 },
      "quantile readouts must be monotone in p")
  }

  test("streaming NB inference reproduces the batch classifier row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val (model, base, vocab) = graft.operators.TextOps.nbModel(spark, sfDir)
    val batchPreds = graft.operators.TextOps.nbLangid(spark, sfDir)
    // stream the same corpus in two micro-batches
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").as[(Long, String, String)]
      .collect()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val input = MemoryStream[(Long, String, String)]
    val out = tmpDir()
    val q = Streams.scoreNbBatches(
      input.toDF().toDF("doc_id", "lang", "text"),
      model, base, vocab, out).start()
    input.addData(b1.toSeq: _*); q.processAllAvailable()
    input.addData(b2.toSeq: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(out)
    assert(streamed.count() === batchPreds.count())
    assert(streamed.except(batchPreds).count() === 0L
      && batchPreds.except(streamed).count() === 0L,
      "micro-batched scoring must equal the one-shot batch scoring")
  }

  test("streaming anomaly flags: prequential outlier caught, flags batch-split invariant") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, sec: Int, v: Double) =
      Streams.Event(id, Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"),
        1L, "purchase", v)
    // 40 in-band points around 100.0, then one 10-sigma spike
    val base = (1 to 40).map(i => ev(i, i % 60, 100.0 + (i % 5) - 2))
    val spike = ev(99, 59, 500.0)
    val input = MemoryStream[Streams.Event]
    val q = Streams.anomalyFlags(input.toDS(), minN = 30)
      .toDF("event_id", "event_type", "val_cents")
      .writeStream.format("memory").queryName("anom")
      .outputMode("update").start()
    input.addData(base: _*)
    q.processAllAvailable()
    input.addData(spike)
    q.processAllAvailable(); q.stop()
    val flagged = spark.table("anom").collect().map(_.getLong(0)).toSet
    assert(flagged === Set(99L), s"got $flagged")
    // state additivity: the same events in ONE batch flag the same set
    // (per-type prequential order is event-time, not batch boundaries)
    val input2 = MemoryStream[Streams.Event]
    val q2 = Streams.anomalyFlags(input2.toDS(), minN = 30)
      .toDF("event_id", "event_type", "val_cents")
      .writeStream.format("memory").queryName("anom_one")
      .outputMode("update").start()
    input2.addData((base :+ spike): _*)
    q2.processAllAvailable(); q2.stop()
    val oneShot = spark.table("anom_one").collect().map(_.getLong(0)).toSet
    assert(oneShot === flagged, s"one-shot $oneShot vs split $flagged")
  }
}
