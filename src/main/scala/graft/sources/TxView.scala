package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate views over
  * [[TxTable]]s — the warehouse op the change feed exists for: keep
  * `SELECT g, sum(v), count(*) GROUP BY g` continuously correct at
  * O(changes) per refresh instead of O(table) recomputes (ref analog:
  * the reference warehouse's periodically re-aggregated summary
  * tables, re-expressed against a transactional change feed).
  *
  * Mechanics of one `refreshAggView`:
  *  1. `lo` = the base version the view already reflects — read from
  *     the view's own commit tags (`lastAppliedBatchId`), so progress
  *     and state are ONE atomic commit: a replayed/raced refresh is
  *     recognized by the tag and becomes a no-op, never double-counts.
  *  2. The change window `changes(base, lo, hi]` reduces to each key's
  *     NET effect: its final state in the window (latest by
  *     commit_version, seq) minus its pre-image in base@lo — only
  *     endpoints matter for a sum/count. The pre-image lookup is a
  *     broadcast semi-join of the CHANGED KEYS against the pinned
  *     snapshot — at 100 TB that is one pruned scan per refresh for
  *     O(changes) changed keys, not a view recompute. Append-only
  *     bases skip the pre-image entirely (all rows insert).
  *  3. Per-group deltas fold into the view's CURRENT rows (read of the
  *     affected groups only) and land as a keyed `mergeDelta` CDC
  *     batch tagged with `hi` — groups whose row count hits zero are
  *     'D' rows, so the view never shows stale empty groups.
  *
  * The view is itself a TxTable: snapshot-isolated readers, time
  * travel over refresh history, and the O(batch) merge-on-read write
  * path all apply unchanged. */
object TxView {

  /** The stream identity under which refreshes tag the view table —
    * one maintenance lineage per view. */
  private val ViewStream = "graft-aggview"

  /** Bring the (grpCol, sum_v = sum(valCol), n_rows) view at
    * `viewRoot` up to date with the base table's latest snapshot.
    * `valCol` must be integral (exact BIGINT arithmetic — render
    * money as cents first). Returns the view's resulting version.
    * Supports keyed (CDC) bases and append-only bases; bases rewritten
    * by non-feed commits (deleteWhere on un-keyed tables) have no
    * change feed to maintain from, matching `TxTable.changes`. */
  def refreshAggView(spark: SparkSession, baseRoot: String,
    viewRoot: String, grpCol: String, valCol: String): Int = {
    val hi = TxTable.latestVersion(spark, baseRoot)
    require(hi > 0, s"txview: base table at $baseRoot has no commits")
    val lo = TxTable.lastAppliedBatchId(spark, viewRoot, ViewStream)
      .getOrElse(0L).toInt
    if (hi <= lo) return TxTable.latestVersion(spark, viewRoot)

    val ch = TxTable.changes(spark, baseRoot, lo, hi)
    require(ch.columns.contains(grpCol) && ch.columns.contains(valCol),
      s"txview: base change feed lacks $grpCol/$valCol " +
        s"(has ${ch.columns.mkString(", ")})")
    val keyColsOpt = TxTable.tableKeys(spark, baseRoot)

    // ±1/±v contribution rows: new endpoint state adds, pre-image
    // retracts; everything else in the window cancels out
    var pinned: Option[DataFrame] = None
    val contrib: DataFrame = keyColsOpt match {
      case None =>
        // append-only base: the window holds only inserts
        ch.select(col(grpCol), col(valCol).cast("long").as("_v"),
          lit(1L).as("_s"))
      case Some(ks) =>
        // each commit's delta dir is already resolved per key
        // (mergeDelta's resolveLatest), so commit_version alone totally
        // orders one key's feed rows
        val w = Window.partitionBy(ks.map(col): _*)
          .orderBy(col("commit_version").desc)
        val finalState = ch.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .persist()
        pinned = Some(finalState)
        val changedKeys = finalState.select(ks.map(col): _*)
        val adds = finalState.filter(col("op") =!= "D")
          .select(col(grpCol), col(valCol).cast("long").as("_v"),
            lit(1L).as("_s"))
        val retracts =
          if (lo == 0) adds.filter(lit(false))
          else TxTable.read(spark, baseRoot, version = lo)
            .join(broadcast(changedKeys), ks, "left_semi")
            .select(col(grpCol), (-col(valCol).cast("long")).as("_v"),
              lit(-1L).as("_s"))
        adds.unionByName(retracts)
    }
    val delta = contrib.groupBy(grpCol)
      .agg(sum("_v").as("_dv"), sum("_s").as("_dn"))

    // fold into the affected groups' current view rows; absolute rows
    // go back through the keyed CDC path (replay-protected by hi)
    val viewLive = TxTable.exists(spark, viewRoot) &&
      TxTable.latestVersion(spark, viewRoot) > 0
    val oldView =
      if (viewLive) TxTable.read(spark, viewRoot)
      else delta.select(col(grpCol), lit(0L).as("sum_v"),
        lit(0L).as("n_rows")).filter(lit(false))
    val folded = delta.join(oldView, Seq(grpCol), "left")
      .select(col(grpCol),
        (coalesce(col("sum_v"), lit(0L)) + col("_dv")).as("sum_v"),
        (coalesce(col("n_rows"), lit(0L)) + col("_dn")).as("n_rows"))
    val cdc = folded.select(col(grpCol),
      when(col("n_rows") <= 0L, lit("D")).otherwise(lit("U")).as("op"),
      col("sum_v"), col("n_rows"), lit(hi.toLong).as("seq"))
    val v = TxTable.mergeDelta(spark, viewRoot, cdc, Seq(grpCol),
      batchId = Some(hi.toLong), streamId = ViewStream)
    pinned.foreach(_.unpersist())
    v
  }

  /** Continuous maintenance: follow the base table's LIVE commits with
    * a Structured Streaming loop — readStream over the `graft-tx` CDC
    * source, one `refreshAggView` per micro-batch. Exactly-once comes
    * from the VIEW's own commit tags, not the checkpoint: the stream
    * is only the wake-up signal (its rows are not consumed — the
    * refresh re-derives its window `(lo, hi]` from the view tag vs the
    * base head), so a replayed micro-batch, a racing manual refresh,
    * or a restart from an old checkpoint all land as recognized no-ops
    * and can never double-count. Stop and restart with the same
    * checkpoint to resume; commits made while offline are picked up on
    * the first batch. */
  def followAggView(spark: SparkSession, baseRoot: String,
    viewRoot: String, grpCol: String, valCol: String,
    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft-tx").load(baseRoot)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
          refreshAggView(spark, baseRoot, viewRoot, grpCol, valCol)
          ()
      }
      .start()

  /** ORACLE-GATED incremental-view exercise (q_txtable_aggview): the
    * deterministic orders-derived CDC stream (the q_txtable_mor
    * shape, plus a customer-segment group column and cents-exact
    * values) lands in the base table as THREE merge-on-read batches;
    * after EVERY batch the view refreshes incrementally — insert
    * floods, updates that move rows between nothing (same group) and
    * deletes that shrink or empty groups. The returned view must
    * equal a full GROUP BY over the final resolved base, which is
    * exactly what the DuckDB oracle computes — hash equality proves
    * three rounds of delta maintenance converge to the recompute. */
  def aggViewGateQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = TxTable.scratchRoot("graft-aggview-base", dir)
    val view = TxTable.scratchRoot("graft-aggview-view", dir)
    val changes = graft.Tables.orders(spark, dir).select(
      col("o_custkey").as("k"),
      expr("CASE WHEN o_orderkey % 10 = 0 THEN 'D' " +
        "WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END").as("op"),
      (col("o_custkey") % 50).as("g"),
      expr("cast(round(o_totalprice * 100, 0) AS BIGINT)").as("v"),
      col("o_orderkey").as("seq"))
    val maxRow = changes.agg(max("seq")).collect()(0)
    if (maxRow.isNullAt(0))
      return changes.select("g").filter(lit(false))
        .select(col("g"), lit(0L).as("sum_v"), lit(0L).as("n_rows"))
    val t1 = maxRow.getLong(0) / 3
    val t2 = 2L * t1
    Seq(changes.filter(col("seq") <= t1),
      changes.filter(col("seq") > t1 && col("seq") <= t2),
      changes.filter(col("seq") > t2)).foreach { batch =>
      TxTable.mergeDelta(spark, base, batch)
      refreshAggView(spark, base, view, "g", "v")
    }
    TxTable.read(spark, view)
  }
}
