package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event-time operators —
  * the continuous-ingest capability of the reference's
  * contrib/hive-streaming, expressed as readStream → event-time
  * transforms → sink. State is bounded by watermarks (windowAgg) and
  * event-time timeouts (sessionize), so the operators hold up on
  * unbounded 100 TB/day streams.
  */
object Streams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  /** Tumbling 1-hour counts with a 2-hour watermark: late events beyond
    * the watermark are dropped, state per (window, type) is evicted
    * once the watermark passes — bounded state on unbounded input. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval join: errors enriched with the same
    * user's clicks from the last 30 minutes. Watermarks on BOTH sides
    * bound the join state — without them the runtime would buffer the
    * full history of each stream. */
  def enrichErrors(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    errors.withWatermark("ts", "1 hour")
      .join(c, expr(
        "user_id = c_user AND click_ts >= ts - INTERVAL 30 MINUTES AND click_ts <= ts"))
      .select(col("event_id"), col("user_id"), col("ts"), col("click_ts"))
  }

  /** Streaming exact dedup — the continuous form of Dedup.exact: state
    * holds only ids inside the watermark horizon, so unbounded streams
    * dedup in bounded memory. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Micro-batch sink via foreachBatch: each batch lands as parquet
    * with exactly-once-per-batch semantics — the continuous warehouse
    * load of contrib/hive-streaming. */
  def writeBatches(stream: DataFrame, path: String) =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      batch.write.mode("append").parquet(path)
    }

  /** Streaming classifier inference via foreachBatch — the standard
    * streaming-inference shape: the NB model is trained OFFLINE
    * (vocabulary-bounded frames, broadcast), each micro-batch of
    * documents is scored map-side by the batch scorer and appended to
    * the sink. Running the scorer inside foreachBatch sidesteps the
    * multiple-stateful-operator limits (the scorer's per-doc
    * aggregations are per-batch, not cross-batch state) while keeping
    * the EXACT batch semantics — the spec asserts micro-batched
    * scoring reproduces the batch predictions row-for-row. */
  def scoreNbBatches(docs: DataFrame, model: DataFrame, base: DataFrame,
      vocab: DataFrame, path: String) =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.operators.TextOps.nbScore(batch, model, base, vocab)
        .write.mode("append").parquet(path)
    }

  /** Streaming CDC upsert via foreachBatch — the continuous form of
    * Olap.cdcMerge: each micro-batch of (k, op, v, seq) changes merges
    * into the keyed parquet table at `path`. Within a batch the
    * highest-seq change per key wins; 'D' deletes the key, 'U'/'I'
    * set the value. The merged result is materialized (localCheckpoint)
    * before overwriting so the read and the write of the same location
    * never overlap. At warehouse scale the same merge lands on a
    * transactional table format; the merge plan itself — one
    * full-outer join per batch — is unchanged. */
  def upsertBatches(changes: DataFrame, path: String) =
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      import org.apache.spark.sql.expressions.Window
      // existence through the Hadoop FileSystem API — java.io.File is
      // local-only and would silently report "absent" on HDFS/S3,
      // making every batch overwrite the table with just its own keys
      val basePath = new org.apache.hadoop.fs.Path(path)
      val fs = basePath.getFileSystem(spark.sessionState.newHadoopConf())
      val base =
        if (fs.exists(basePath))
          spark.read.parquet(path).select(col("k"), col("v").as("base_v"))
        else batch.sparkSession.emptyDataFrame
          .withColumn("k", lit(0L)).withColumn("base_v", lit(0.0))
          .select("k", "base_v")
      val w = Window.partitionBy("k").orderBy(col("seq").desc)
      val latest = batch.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("k", "op", "v")
      val merged = base.join(latest, Seq("k"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("k"), coalesce(col("v"), col("base_v")).as("v"))
        .localCheckpoint(true)
      merged.write.mode("overwrite").parquet(path)
      ()
    }

  /** Streaming CDC upsert into a TRANSACTIONAL snapshot table
    * (sources.TxTable) — the production form of `upsertBatches`: each
    * micro-batch merges copy-on-write into a new atomically-committed
    * snapshot. Readers see whole batches or nothing (no
    * read-your-own-overwrite hazard, so no localCheckpoint needed),
    * failed batches leave the table at the previous version, and
    * time travel across batch boundaries comes free. */
  def upsertTxBatches(changes: DataFrame, root: String) =
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.sources.TxTable.merge(batch.sparkSession, root, batch)
      ()
    }

  /** The merge-on-READ form: each micro-batch commits only its own
    * delta (O(batch), not O(table)) — the ONLY upsert shape that
    * survives a continuous load into a 100 TB table — with a
    * compaction every `compactEvery` batches to fold deltas and keep
    * read-side resolution bounded. EXACTLY-ONCE: the micro-batch id is
    * recorded in the commit header, so a replayed batch (restart after
    * a sink-side failure — foreachBatch is at-least-once) is
    * recognized and skipped instead of double-applied. */
  def upsertTxDeltaBatches(changes: DataFrame, root: String,
    compactEvery: Int = 10) =
    changes.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      graft.sources.TxTable.mergeDelta(batch.sparkSession, root, batch,
        batchId = Some(id))
      if (compactEvery > 0 && (id + 1) % compactEvery == 0)
        graft.sources.TxTable.compactSnapshot(batch.sparkSession, root)
      ()
    }

  /** 30-minute-gap sessionization via typed state per user
    * (flatMapGroupsWithState): emits a session when the gap elapses.
    * The streaming analog of Windows.sessionize.
    *
    * State is bounded: an event-time timeout fires once the watermark
    * passes `last_event + gap`, flushing the user's open session and
    * REMOVING the per-user state — so an idle user's final session is
    * emitted and a 100 TB/day stream with an unbounded user universe
    * keeps only in-horizon users in the state store. */
  /** Per-user funnel progress over a stream — the streaming twin of
    * `Olap.funnel`'s greedy semantics: the FIRST event (in event-time
    * order) of the next stage inside the conversion window advances
    * the user; emitted rows carry the user's CURRENT stage (update
    * semantics — downstream keeps the latest per user). With in-order
    * delivery the reached stages equal the batch computation, because
    * greedy stage times are prefix-monotone: a later event can never
    * retro-fill an earlier stage. State is 4 longs per user. */
  case class FunnelState(t1: Long, t2: Long, t3: Long, t4: Long)
  def funnelStages(events: Dataset[Event],
    convWindowUs: Long = 86400000000L): Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, (Long, Int)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, -1L))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime * 1000
            e.event_type match {
              case "signup" if s.t1 < 0 =>
                s = s.copy(t1 = t)
              case "view" if s.t1 >= 0 && s.t2 < 0 &&
                t > s.t1 && t <= s.t1 + convWindowUs =>
                s = s.copy(t2 = t)
              case "click" if s.t2 >= 0 && s.t3 < 0 &&
                t > s.t2 && t <= s.t2 + convWindowUs =>
                s = s.copy(t3 = t)
              case "purchase" if s.t3 >= 0 && s.t4 < 0 &&
                t > s.t3 && t <= s.t3 + convWindowUs =>
                s = s.copy(t4 = t)
              case _ =>
            }
          }
          state.update(s)
          val stage =
            if (s.t4 >= 0) 4 else if (s.t3 >= 0) 3
            else if (s.t2 >= 0) 2 else if (s.t1 >= 0) 1 else 0
          if (stage == 0) Iterator.empty else Iterator.single((user, stage))
      }
  }

  /** Streaming integer EWMA — the typed-state twin of `Olap.ewma`:
    * per event-type state is (last emitted day, running smoothed
    * cents); each COMPLETED day folds through the same dyadic
    * recursion e ← (x + 3e) div 4 and emits its smoothed value.
    * Day boundaries are detected when a later day's first event
    * arrives (in-order delivery, like the other twins), so the final
    * open day stays buffered in state rather than emitting a partial
    * aggregate. State per type: one day string + two longs. */
  case class EwmaState(day: String, daySum: Long, e: Long, started: Boolean)

  case class CusumState(day: String, daySum: Long, s: Long)

  /** Streaming CUSUM drift monitor — the live twin of `Olap.cusum`:
    * per event type, each CLOSED day folds
    * `s = max(0, s + (daySum - target))` and emits
    * (type, day, cents, cusum, alarm = cusum > h). Unlike the batch
    * form (which derives target and threshold from the whole series),
    * the stream monitors against PRECOMPUTED per-type baselines
    * `(target, h)` — the deployment shape: the batch pass profiles
    * history, the stream watches new days against it. Same
    * day-boundary contract as `ewmaDaily`: a day emits when its
    * successor's first event arrives; state per type is one string +
    * two longs. */
  def cusumDaily(events: Dataset[Event],
    baselines: Map[String, (Long, Long)])
    : Dataset[(String, String, Long, Long, Boolean)] = {
    import events.sparkSession.implicits._
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState,
        (String, String, Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[Event], state: GroupState[CusumState]) =>
          val (tgt, h) = baselines.getOrElse(typ, (0L, Long.MaxValue))
          var st = state.getOption.getOrElse(CusumState(null, 0L, 0L))
          val out = Seq.newBuilder[(String, String, Long, Long, Boolean)]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { ev =>
            val d = fmt.format(ev.ts)
            val cents = (BigDecimal(ev.value).setScale(2,
              BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
            if (st.day == null) st = CusumState(d, cents, 0L)
            else if (d < st.day) () // late event for an emitted day:
            // drop it — reopening a closed day would double-emit it
            // in Append mode. yyyy-MM-dd compares lexically.
            else if (d == st.day) st = st.copy(daySum = st.daySum + cents)
            else {
              val s2 = math.max(0L, st.s + (st.daySum - tgt))
              out += ((typ, st.day, st.daySum, s2, s2 > h))
              st = CusumState(d, cents, s2)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
  def ewmaDaily(events: Dataset[Event])
    : Dataset[(String, String, Long, Long)] = {
    import events.sparkSession.implicits._
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, (String, String, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[Event], state: GroupState[EwmaState]) =>
          var s = state.getOption.getOrElse(EwmaState(null, 0L, 0L, false))
          val out = Seq.newBuilder[(String, String, Long, Long)]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { ev =>
            val d = fmt.format(ev.ts)
            val cents = (BigDecimal(ev.value).setScale(2,
              BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
            if (s.day == null) s = EwmaState(d, cents, 0L, false)
            else if (d < s.day) () // drop late events for closed days
            else if (d == s.day) s = s.copy(daySum = s.daySum + cents)
            else {
              // truncating / to match DuckDB // (and Olap.ewma) on
              // negative daily sums
              val e = if (!s.started) s.daySum
                      else (s.daySum + 3 * s.e) / 4
              out += ((typ, s.day, s.daySum, e))
              s = EwmaState(d, cents, e, started = true)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming Holt linear trend — the typed-state twin of
    * `Olap.holt`: per event-type state is (open day, day sum, level,
    * trend); each COMPLETED day folds through the same truncating
    * dyadic recursion (l ← (x+l+b) div 2, b ← (Δl+b) div 2) and
    * emits (day, cents, level, trend, forecast). Same in-order day-
    * boundary contract as `ewmaDaily`; state per type is one string +
    * three longs. */
  case class HoltState(day: String, daySum: Long, l: Long, b: Long,
    started: Boolean)
  def holtDaily(events: Dataset[Event])
    : Dataset[(String, String, Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[HoltState,
        (String, String, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[Event], state: GroupState[HoltState]) =>
          var s = state.getOption.getOrElse(HoltState(null, 0L, 0L, 0L, false))
          val out = Seq.newBuilder[(String, String, Long, Long, Long, Long)]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { ev =>
            val d = fmt.format(ev.ts)
            val cents = (BigDecimal(ev.value).setScale(2,
              BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
            if (s.day == null) s = HoltState(d, cents, 0L, 0L, false)
            else if (d < s.day) () // drop late events for closed days
            else if (d == s.day) s = s.copy(daySum = s.daySum + cents)
            else {
              val (l2, b2) =
                if (!s.started) (s.daySum, 0L)
                else {
                  val nl = (s.daySum + s.l + s.b) / 2
                  (nl, ((nl - s.l) + s.b) / 2)
                }
              out += ((typ, s.day, s.daySum, l2, b2, l2 + b2))
              s = HoltState(d, cents, l2, b2, started = true)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming first/last-touch attribution — the typed-state twin of
    * `Olap.attribution`: per-user state carries the first and the
    * latest preceding touch (two small strings); each purchase emits
    * one final fact row (event_id, both channels, exact cents), so
    * Append semantics downstream. With in-order delivery the emitted
    * credit equals the batch window formulation: first/last over the
    * strictly-preceding frame is prefix-computable, which is exactly
    * what the state captures. */
  case class TouchState(first: String, last: String)
  def attributionFacts(events: Dataset[Event])
    : Dataset[(Long, String, String, Long)] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, (Long, String, String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[TouchState]) =>
          var s = state.getOption.getOrElse(TouchState(null, null))
          val out = Seq.newBuilder[(Long, String, String, Long)]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            e.event_type match {
              case "click" | "view" =>
                s = TouchState(
                  if (s.first == null) e.event_type else s.first,
                  e.event_type)
              case "purchase" =>
                val cents = (BigDecimal(e.value).setScale(2,
                  BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
                out += ((e.event_id,
                  Option(s.first).getOrElse("direct"),
                  Option(s.last).getOrElse("direct"), cents))
              case _ =>
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Prequential σ-threshold anomaly flags — the streaming twin of
    * `Olap.anomaly`. Each event is tested against the running
    * per-type population moments INCLUDING itself (the prequential
    * convention: no look-ahead, deterministic given arrival order),
    * with the same all-integer decision the batch operator gates:
    * (n·v − s)² > 9·(n·ss − s²), evaluated in BigInt so no overflow
    * at any stream length. State per event_type is three numbers;
    * cold-start types emit nothing until n ≥ `minN` (a z-score over
    * 1-2 points is noise). */
  case class MomentState(n: Long, s: BigInt, ss: BigInt)
  def anomalyFlags(events: Dataset[Event],
    minN: Long = 30): Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[MomentState, (Long, String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[Event], state: GroupState[MomentState]) =>
          var st = state.getOption.getOrElse(MomentState(0L, BigInt(0), BigInt(0)))
          val out = Seq.newBuilder[(Long, String, Long)]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val v = (BigDecimal(e.value).setScale(2,
              BigDecimal.RoundingMode.HALF_UP) * 100).toBigInt
            st = MomentState(st.n + 1, st.s + v, st.ss + v * v)
            val n = BigInt(st.n)
            val lhs = (n * v - st.s).pow(2)
            val rhs = (n * st.ss - st.s * st.s) * 9
            if (st.n >= minN && lhs > rhs)
              out += ((e.event_id, typ, v.toLong))
          }
          state.update(st)
          out.result().iterator
      }
  }

  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = 1800L * 1000 * 1000
    val gapMs = gapUs / 1000
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Watermark passed last + gap with no new events: the open
            // session is final. Emit it and evict the user's state.
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.n, st.start, st.last))
          } else {
            // Events within a micro-batch arrive unordered: sort by event time.
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(-1, -1, 0))
            val out = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              val t = e.ts.getTime * 1000
              if (st.n == 0) st = SessionState(t, t, 1)
              else if (t - st.last > gapUs) {
                out += SessionOut(user, st.n, st.start, st.last)
                st = SessionState(t, t, 1)
              } else st = SessionState(st.start, t, st.n + 1)
            }
            state.update(st)
            // Flush once the watermark passes the gap after the newest
            // event; clamp above the current watermark (a very late
            // straggler could otherwise set a timeout in the past,
            // which the state store rejects).
            state.setTimeoutTimestamp(
              math.max(st.last / 1000 + gapMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
