package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time processing over the `events` table — the warehouse-load
  * path the reference serves with contrib/hive-streaming (continuous
  * ingest) re-expressed as Structured Streaming. The batch forms here
  * are the oracle-checkable semantics; `Streams` holds the streaming
  * twins (same logic over readStream + watermark).
  */
object Windows {

  /** Sliding-window distinct-user sketch: the KMV θ-sketch
    * (plans.KmvUniq) per 10-minute window sliding every 5 — duration =
    * 2×slide, so every event lands in exactly two windows and the
    * DuckDB oracle replays the window assignment with a 2-way unnest
    * (q_sketch_window). The sketch keeps per-window state at k hashes
    * no matter how many events a window sees, and the identical plan
    * runs over readStream (watermark + update mode) — the
    * theta-sketch-over-sliding-windows shape [t: StreamsSpec]. */
  def kmvSlidingWindows(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        expr("md5(cast(user_id as string))").as("h"))
      .groupBy("w")
      .agg(expr(s"kmv_uniq(h, $k)").as("s"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("s.est").as("est_uniq"), col("s.kth").as("kth_hash"))
  }

  /** Tumbling 1-hour window aggregation (batch form). The streaming
    * twin is Streams.windowedCounts with a 2h watermark. */
  def windowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))

  /** Native session windows (session_window, gap = 30 min): the
    * built-in operator computing the same sessions as `sessionize`'s
    * lag/cumsum formulation — works identically over readStream for
    * the streaming path. Output start/end reconstructed to event
    * times (window end = last event + gap). */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("sstart"),
        date_format(expr("w.end - INTERVAL 30 MINUTES"), "yyyy-MM-dd HH:mm:ss").as("send"))

  /** Sessionization with a 30-minute inactivity gap (batch form):
    * classic lag + cumulative-sum session numbering, all windows
    * partitioned by user so it scales out. The streaming twin is
    * Streams.sessionize (flatMapGroupsWithState). Ordering runs on
    * exact epoch-micros integers with event_id tiebreaks. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("tsus"))
    val ord = W.partitionBy("user_id").orderBy(col("tsus"), col("event_id"))
    val run = ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    ev.withColumn("prev", lag("tsus", 1).over(ord))
      .withColumn("flag",
        when(col("prev").isNull || col("tsus") - col("prev") > 1800000000L, 1).otherwise(0))
      .withColumn("sess", sum("flag").over(run))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        date_format(expr("timestamp_micros(min(tsus))"), "yyyy-MM-dd HH:mm:ss").as("sstart"),
        date_format(expr("timestamp_micros(max(tsus))"), "yyyy-MM-dd HH:mm:ss").as("send"))
  }
}
