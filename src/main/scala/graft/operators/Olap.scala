package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** OLAP analytics the warehouse's report jobs hand-roll as MapReduce
  * chains (multi-level aggregation = one job per level in the
  * reference; here one rollup/cube plan with partial aggregation):
  * rollup subtotals, pivot, running totals, exact discrete
  * percentiles, anti join, and as-of join (latest-event enrichment).
  */
object Olap {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Frequent item-pair mining (market-basket analysis) — the classic
    * warehouse A-priori job (Agrawal & Srikant 1994), run as a
    * multi-pass MapReduce chain in the reference era; here one plan:
    * pass 1 prunes to frequent items (the A-priori property: a pair
    * can only be frequent if both items are), pass 2 counts pairs from
    * a basket self-join restricted to frequent items.
    *
    * Scale shape: the item-frequency prune is one combiner-backed
    * aggregate; the pair generation is a self-join on the basket key
    * (orderkey) — both sides share ONE exchange (ReuseExchange), the
    * fan-out per basket is bounded by basket size (TPC-H ≤ 7 lines),
    * and the frequent-item semi-join shrinks the join input before the
    * shuffle. Never an item×item cross join. */
  def itemsets(spark: SparkSession, dir: String,
    itemSup: Int = 30, pairSup: Int = 3): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val freq = li.groupBy("pk").agg(count(lit(1)).as("c"))
      .filter(col("c") >= itemSup).select("pk")
    val fli = li.join(freq, Seq("pk"), "semi")
    val a = fli.select(col("ok"), col("pk").as("pa"))
    val b = fli.select(col("ok"), col("pk").as("pb"))
    a.join(b, Seq("ok")).filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
      .filter(col("support") >= pairSup)
  }

  /** ROLLUP subtotal hierarchy — (flag, status), (flag), (); NULL
    * grouping slots made explicit so the oracle agrees. */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))

  /** CUBE: all 2^2 grouping combinations in one pass (the reference
    * would run one MapReduce job per combination). */
  def cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))

  /** GROUPING SETS with explicit grouping_id — the general form rollup
    * and cube specialize; the id makes each subtotal level
    * self-describing (the reference emits one labeled output per
    * aggregation job). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  cast(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |""".stripMargin)
  }

  /** The navigation-window family — lag/lead/first/last over the
    * per-customer order timeline (the reference's sorted-reduce-values
    * iteration). Key-partitioned window, integer/date outputs only. */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        coalesce(lag("o_orderkey", 1).over(w), lit(-1L)).as("prev_key"),
        coalesce(lead("o_orderkey", 1).over(w), lit(-1L)).as("next_key"),
        first("o_orderkey").over(w).as("first_key"),
        row_number().over(w).as("seq"))
  }

  /** The complete rank family over one partitioned window — rank,
    * dense_rank, percent_rank, cume_dist, ntile — the remaining
    * window functions `windowFuncs` doesn't cover. Ordering carries a
    * deterministic (price DECIMAL desc, key) tie-break, so ranks are
    * engine-identical; percent_rank/cume_dist are single IEEE
    * divisions of exact integers (portable bitwise). The window is
    * PARTITIONED (per order priority), so it scales out; the rank
    * filter keeps the gated output bounded. */
  def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("p").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).as("quartile"))
      .filter(col("rnk") <= 40)
  }

  /** Correlation/covariance per group — EXACT integer/decimal sums
    * (quantity in units, price in cents; decimal(38,0) so no overflow
    * at any scale) feeding the mean-centered formulas in one fixed
    * IEEE sequence, identical in both engines. The engine-native
    * corr()/covar_pop() accumulate doubles in partition order and are
    * not bitwise portable. */
  def corrStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").cast("bigint").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").multiply(100).cast("bigint").as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"),
        (col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n")))
          .as("covar_pop"),
        ((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))) /
          (sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))) *
            sqrt(col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n")))))
          .as("corr"))

  /** Pivot order counts: status columns per priority row. */
  def pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** Per-customer running order total — exact decimal prefix sums. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("rt"))
  }

  /** Exact discrete percentiles (the element itself, no interpolation
    * — portable across engines, unlike percentile_cont low bits). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)").as("p99"))

  /** Anti join: customers with no orders at all. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Funnel analysis — the staple warehouse report: how far does each
    * user progress through signup → view → click → purchase, where
    * each stage must happen strictly after the previous one AND within
    * a 24 h conversion window. Each stage is one filtered aggregate
    * joined forward; no window over the raw stream, so stages scale as
    * ordinary shuffles. */
  def funnel(spark: SparkSession, dir: String,
    convWindowUs: Long = 86400000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("t"))
    def stage(evType: String, prev: DataFrame, prevCol: String, outCol: String) =
      ev.filter(col("event_type") === evType)
        .join(prev, "user_id")
        .filter(col("t") > col(prevCol) && col("t") <= col(prevCol) + convWindowUs)
        .groupBy("user_id").agg(min("t").as(outCol))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("t").as("t1"))
    val s2 = stage("view", s1, "t1", "t2")
    val s3 = stage("click", s2, "t2", "t3")
    val s4 = stage("purchase", s3, "t3", "t4")
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .join(s4, Seq("user_id"), "left")
      .select(expr(
        """CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3
          |     WHEN t2 IS NOT NULL THEN 2 ELSE 1 END""".stripMargin).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  /** Cohort retention: users grouped by first-signup day, counted on
    * each later active day (any event type). Day arithmetic on integer
    * epoch-days keeps both engines exact. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("cohort_day"))
    val active = ev.select("user_id", "day").distinct()
    active.join(cohort, "user_id")
      .filter(col("day") >= col("cohort_day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** The salted big-big join under the correctness gate: lineitem ⋈
    * orders through `Skew.saltedJoin` (hot side spread over 8 salt
    * buckets, other side replicated ×8) aggregated to monthly revenue —
    * the oracle is the PLAIN join, proving salting is
    * result-transparent. */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    val joined = graft.operators.Skew.saltedJoin(li, ord, "l_orderkey")
    joined
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Interval/range join, binned: for every error event, how many
    * clicks (any user) happened within ±5 minutes. A naive inequality
    * join is a broadcast-nested-loop at scale; binning time into
    * window-sized buckets and replicating one side to bin±1 turns it
    * into an equi-join on the bin + a residual filter — each candidate
    * pair meets in exactly one bin (the probe's own), so no dedup pass
    * is needed. */
  def rangeJoinBinned(spark: SparkSession, dir: String,
    windowUs: Long = 300000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), expr("unix_micros(ts)").as("t"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("t").as("te"),
        expr(s"t div ${windowUs}L").as("bin"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("t").as("tc"),
        explode(expr(s"array(t div ${windowUs}L - 1, t div ${windowUs}L, t div ${windowUs}L + 1)")).as("bin"))
    val matches = errors.join(clicks, "bin")
      .filter(abs(col("te") - col("tc")) <= windowUs)
      .groupBy("eid").agg(count(lit(1)).as("n"))
    errors.select("eid").join(matches, Seq("eid"), "left")
      .select(col("eid"), coalesce(col("n"), lit(0L)).as("n_nearby"))
  }

  /** As-of join: for every 'error' event, the user's most recent
    * 'click' at or before it. Implemented as the union+running-max
    * trick — one window over the merged stream, partitioned by user —
    * instead of an inequality join (which Spark would execute as a
    * broadcast-nested-loop at 100 TB). Ties at the same timestamp
    * count the click first. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tsus"))
      .filter(col("event_type").isin("click", "error"))
      .withColumn("is_click", when(col("event_type") === "click", 1).otherwise(0))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsus"), col("is_click").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click",
      max(when(col("is_click") === 1, col("tsus"))).over(w))
      .filter(col("is_click") === 0)
      .select(col("event_id"), col("user_id"), col("tsus"),
        coalesce(col("last_click"), lit(-1L)).as("last_click"))
  }

  /** FORWARD as-of join with tolerance — the complement of `asofJoin`
    * (pandas merge_asof direction='forward'): for every 'error', the
    * user's NEXT 'click' at or after it, kept only within the
    * tolerance window (an hour), else -1. Same union+running-extreme
    * shape — one partitioned window over the merged stream, never an
    * inequality join (broadcast-nested-loop at 100 TB). Ties at the
    * same timestamp count the click (errors sort before clicks in
    * the frame, so a same-instant click is "at or after"). */
  def asofForward(spark: SparkSession, dir: String,
    tolUs: Long = 3600000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tsus"))
      .filter(col("event_type").isin("click", "error"))
      .withColumn("is_click", when(col("event_type") === "click", 1).otherwise(0))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsus"), col("is_click"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev.withColumn("nc",
      min(when(col("is_click") === 1, col("tsus"))).over(w))
      .filter(col("is_click") === 0)
      .select(col("event_id"), col("user_id"), col("tsus"),
        when(col("nc").isNotNull && col("nc") - col("tsus") <= tolUs,
          col("nc")).otherwise(lit(-1L)).as("next_click"))
  }

  /** NEAREST as-of join — both directions at once: each error event
    * pairs with its closest click (backward OR forward) within
    * tolerance, ties to the backward side — the "closest reading"
    * sensor-fusion shape that one-directional as-of joins cannot
    * express. Same two-window plan as the one-sided forms (per-user
    * running min/max — no join at all, no global sort); a click at
    * the exact same microsecond as the error sorts after it
    * (is_click tiebreak) and is therefore a FORWARD match,
    * identically in both engines. Sentinel -1 / '-' when no click is
    * inside the tolerance on either side. */
  def asofNearest(spark: SparkSession, dir: String,
    tolUs: Long = 3600000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tsus"))
      .filter(col("event_type").isin("click", "error"))
      .withColumn("is_click", when(col("event_type") === "click", 1).otherwise(0))
    val wf = Window.partitionBy("user_id")
      .orderBy(col("tsus"), col("is_click"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wb = Window.partitionBy("user_id")
      .orderBy(col("tsus"), col("is_click"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("nc",
      min(when(col("is_click") === 1, col("tsus"))).over(wf))
      .withColumn("pc",
        max(when(col("is_click") === 1, col("tsus"))).over(wb))
      .filter(col("is_click") === 0)
      .withColumn("dn", when(col("nc").isNotNull &&
        col("nc") - col("tsus") <= tolUs, col("nc") - col("tsus")))
      .withColumn("dp", when(col("pc").isNotNull &&
        col("tsus") - col("pc") <= tolUs, col("tsus") - col("pc")))
      .select(col("event_id"), col("user_id"), col("tsus"),
        when(col("dp").isNotNull && (col("dn").isNull || col("dp") <= col("dn")),
          col("pc"))
          .when(col("dn").isNotNull, col("nc"))
          .otherwise(lit(-1L)).as("nearest_click"),
        when(col("dp").isNotNull && (col("dn").isNull || col("dp") <= col("dn")),
          lit("P"))
          .when(col("dn").isNotNull, lit("N"))
          .otherwise(lit("-")).as("side"))
  }

  /** CDC merge — applying a change stream (I/U/D) onto a base table,
    * the nightly upsert every warehouse runs (the reference's
    * override-join generalized with deletes and inserts). One full
    * outer join on the key: delete rows vanish, updates/inserts take
    * the change's value, untouched base rows pass through. Change set
    * here is derived deterministically from orders (op = D for sum
    * divisible by 7; synthetic new keys for inserts). */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_acctbal").cast("decimal(18,2)").as("bal"))
    val agg = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v"))
    val changes = agg.select(
      when(col("o_custkey") % 13 === 0, col("o_custkey") + 10000000L)
        .otherwise(col("o_custkey")).as("k"),
      when(expr("cast(v * 100 as bigint) % 7 = 0"), lit("D")).otherwise(
        when(col("o_custkey") % 13 === 0, lit("I")).otherwise(lit("U"))).as("op"),
      col("v"))
    base.join(changes, Seq("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k").as("c_custkey"),
        coalesce(col("v"), col("bal")).cast("double").as("bal"),
        coalesce(col("op"), lit("keep")).as("src_op"))
  }

  /** SCD Type-2 history build — each customer's order-priority
    * timeline versioned with [valid_from, valid_to) ranges: the
    * window-lead formulation of the slowly-changing-dimension job
    * (one shuffle on the key; each partition's timeline is local).
    * valid_to is 'current' for the open version. */
  /** Time-series gap filling with last-observation-carried-forward —
    * the report-job step between raw event aggregation and charting:
    * per event_type, a complete daily spine from first to last active
    * day (missing days appear with n_events = 0 and the previous day's
    * revenue carried forward). The spine is generated per key from its
    * own [min, max] day bounds (sequence + explode — map-side, no
    * driver loop); LOCF is one `last(_, ignoreNulls)` window per key.
    * Exact integer cents throughout — no float hazards. */
  def gapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
    val spine = daily.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
    spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("was_gap", when(col("n_events").isNull, 1L).otherwise(0L))
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("was_gap"),
        last("cents", ignoreNulls = true).over(w).as("cents_locf"))
  }

  /** Trailing 7-day moving aggregate via a RANGE frame on the integer
    * day key — the sliding-report pattern. The frame is value-based
    * (RANGE BETWEEN 6 PRECEDING AND CURRENT ROW over epoch-day), so
    * days missing from the data genuinely shrink the window rather
    * than silently widening it the way a ROWS frame would. The average
    * is derived from exact integer sums by ONE IEEE division —
    * engine-portable. */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("cents"), count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    daily.select(col("event_type"), col("day"), col("cents"),
      sum("cents").over(w).as("cents_7d"),
      (sum("cents").over(w).cast("double") /
        sum("n_events").over(w).cast("double")).as("avg_event_cents_7d"))
  }

  /** Incremental aggregate maintenance — the materialized-view delta
    * pattern every nightly warehouse load runs: yesterday's per-key
    * partials (count, sum) are NOT recomputed; today's delta is
    * aggregated alone and merged by summing partials. Sum and count
    * are self-mergeable; avg is re-derived from the merged partials
    * (never averaged across partials). The oracle recomputes from
    * scratch, proving merge == recompute. */
  def incrementalAgg(spark: SparkSession, dir: String,
    splitDate: String = "1998-01-01"): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    def partial(df: DataFrame) = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("price").as("total"))
    val base = partial(orders.filter(col("o_orderdate") < lit(splitDate).cast("timestamp")))
    val delta = partial(orders.filter(col("o_orderdate") >= lit(splitDate).cast("timestamp")))
    base.unionByName(delta)
      .groupBy("o_custkey")
      .agg(sum("n_orders").as("n_orders"),
        sum("total").cast("decimal(18,2)").as("total_dec"))
      .select(col("o_custkey"), col("n_orders"),
        col("total_dec").cast("double").as("total"),
        (col("total_dec").cast("double") / col("n_orders").cast("double"))
          .as("avg_price"))
  }

  /** Event-path (clickstream sequence) analysis: each user's first 8
    * events in time order joined into a path string, then path
    * frequencies — the funnel-discovery companion to `funnel`'s fixed
    * stage list. Per-user ordering is a keyed window (rank by
    * microsecond + event_id tiebreak); the path string is assembled
    * from a rank-sorted in-group array, so no single-partition
    * operation anywhere. Top-20 paths. */
  def eventPaths(spark: SparkSession, dir: String, maxLen: Int = 8,
    topK: Int = 20): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val paths = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxLen)
      .groupBy("user_id")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"),
        ">").as("path"))
    val top = paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path")).limit(topK)
    val rw = Window.orderBy(col("n_users").desc, col("path"))
    top.withColumn("rk", row_number().over(rw))
      .select("rk", "path", "n_users")
  }

  /** Per-group least-squares regression (y = a + b·x, with r²) —
    * price-vs-quantity per return flag. Same portability recipe as
    * `corrStats`: the five moments are EXACT decimal(38,0) sums of
    * integer surrogates (quantity in units, price in cents), and
    * slope/intercept/r² are a FIXED IEEE sequence over those exact
    * sums, so both engines produce bitwise-identical doubles. The
    * engine-native regr_slope/regr_intercept accumulate doubles in
    * partition order and are not portable. One combiner-backed
    * aggregate → one tiny exchange — the 100 TB shape of any
    * moment-based statistic. */
  def regression(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").cast("bigint").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").multiply(100).cast("bigint").as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"),
        // covariance / variance ratios in the identical operation order
        // as the oracle SQL — every subexpression is spelled out once
        ((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))) /
          (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))))
          .as("slope"),
        (col("sy") / col("n") -
          ((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))) /
            (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")))) *
          (col("sx") / col("n"))).as("intercept"),
        (((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))) *
          (col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n")))) /
          ((col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))) *
            (col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n")))))
          .as("r2"))

  /** Higher central moments per group — skewness and excess kurtosis
    * from the first four raw power sums, same portability recipe as
    * `corrStats`/`regression`: EXACT decimal(38,0) sums of integer
    * quantity units, one FIXED IEEE sequence for the standardized
    * moments (x^1.5 spelled sqrt(x)·x, a deterministic two-op chain
    * both engines evaluate identically — pow(x, 1.5) low bits are
    * not portable). The native skewness()/kurtosis() stream doubles
    * in partition order; these don't. Single combiner-backed
    * aggregate → one tiny exchange. */
  def momentStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").cast("bigint").as("x"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("s1"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("s2"),
        sum((col("x") * col("x") * col("x")).cast("decimal(38,0)"))
          .cast("double").as("s3"),
        sum((col("x") * col("x") * col("x") * col("x")).cast("decimal(38,0)"))
          .cast("double").as("s4"))
      .select(col("l_returnflag"), col("n"),
        expr("s1 / n").as("mean"),
        expr("s2 / n - (s1 / n) * (s1 / n)").as("var_pop"),
        expr("""(s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)) /
               |(sqrt(s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)))"""
          .stripMargin.replace("\n", " ")).as("skewness"),
        expr("""(s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               | - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) /
               |((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3"""
          .stripMargin.replace("\n", " ")).as("kurtosis"))

  /** χ² independence audit over the lang × source contingency table —
    * the feature-vs-label dependence screen a classifier pipeline runs
    * before trusting a signal. Per-cell contributions are kept EXACT:
    * contrib_micro = (o·N − r·c)²·10⁶ intdiv (N·r·c) in decimal(38,0)
    * (χ² = Σ contrib_micro / 10⁶ — an order-free INTEGER total, so
    * the statistic is hash-gateable; float expected-count chains are
    * not). Valid while (o·N)²·10⁶ < 10³⁸, i.e. corpora to ~10¹⁵ cell
    * observations; beyond that divide all four counts by a common
    * scale first. Plan: one cell aggregate + two margin aggregates
    * (broadcast back) + a broadcast 1-row N — contingency-table-scale
    * work regardless of corpus size. */
  def chi2(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cells = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rows = docs.groupBy("lang").agg(count(lit(1)).as("r"))
    val cols = docs.groupBy("source").agg(count(lit(1)).as("c"))
    val tot = docs.groupBy().agg(count(lit(1)).as("nn"))
    cells.join(broadcast(rows), "lang").join(broadcast(cols), "source")
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("o"),
        expr("""cast((cast(o as decimal(38,0)) * nn - cast(r as decimal(38,0)) * c)
               | * (cast(o as decimal(38,0)) * nn - cast(r as decimal(38,0)) * c)
               | * 1000000 div (cast(nn as decimal(38,0)) * r * c) as bigint)"""
          .stripMargin.replace("\n", " ")).as("contrib_micro"))
  }

  /** Bitmap-index audience overlap — exact distinct-user intersection
    * counts between every event-type pair, the segment-overlap report
    * an OLAP bitmap index answers. Users are packed 64-per-word:
    * block = id div 64, word = bit_or of (1 << id mod 64) per
    * (type, block); the pairwise overlap is Σ_blocks
    * popcount(wa & wb). The heavy input collapses to |types|·|blocks|
    * words BEFORE any pairwise work (the bitmap compression that makes
    * audience-overlap tractable at 10⁹ users), the pair join is
    * block-co-partitioned, and every step is exact integer bit
    * algebra — no approximate sketch, no distinct over pairs. */
  def bitmapOverlap(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), expr("user_id div 64").as("blk"),
        expr("shiftleft(cast(1 as bigint), cast(pmod(user_id, 64) as int))").as("bit"))
      .groupBy("event_type", "blk")
      .agg(expr("bit_or(bit)").as("w"))
    words.select(col("event_type").as("type_a"), col("blk"), col("w").as("wa"))
      .join(words.select(col("event_type").as("type_b"), col("blk"), col("w").as("wb")),
        "blk")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(sum(expr("bit_count(wa & wb)")).as("n_overlap"))
      .filter(col("n_overlap") > 0)
  }

  /** Left-semi join: customers holding at least one open order —
    * the EXISTS-subquery shape. Spark plans the semi join without
    * materializing order columns; at 100 TB the orders side reduces
    * to its distinct custkeys before/inside the shuffle. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** σ-threshold anomaly flags — events whose value sits more than
    * 3 population standard deviations from their event_type's mean,
    * decided ENTIRELY in integer arithmetic: with s = Σx, ss = Σx²
    * over cents, z² > 9 ⟺ (n·x − s)² > 9·(n·ss − s²), so no engine
    * ever computes a float mean or stddev and the flag set is exact.
    * decimal(38,0) holds both sides even at n = 10¹² rows of 10⁶-cent
    * values ((n·x)² ≈ 10³⁶ < 10³⁸). Plan: one tiny per-type aggregate
    * broadcast back against the scan — the event stream itself never
    * shuffles. */
  def anomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,2)").multiply(100).cast("bigint").as("v"))
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("v").cast("decimal(38,0)")).as("s"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("ss"))
    ev.join(broadcast(stats), "event_type")
      .filter((col("n") * col("v") - col("s")) * (col("n") * col("v") - col("s")) >
        (col("n") * col("ss") - col("s") * col("s")) * 9)
      .select(col("event_id"), col("event_type"), col("v").as("val_cents"))
  }

  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate"))
      .withColumn("valid_from", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .withColumn("valid_to",
        coalesce(date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd"),
          lit("current")))
      .withColumn("version", row_number().over(w))
      .select(col("o_custkey"), col("version"), col("o_orderpriority"),
        col("valid_from"), col("valid_to"))
  }

  /** Winsorized aggregates — the robust-stats report: per-type revenue
    * with values clamped to the exact discrete [p01, p99] band, so a
    * handful of outliers can't swamp a mean. Exact integer cents and
    * `percentile_disc` thresholds (an actual data value, not an
    * interpolation — bitwise portable, proven by q_percentiles), so
    * raw and winsorized sums hash-gate. Plan: one tiny per-type
    * threshold aggregate broadcast back against the scan — the event
    * stream shuffles once for the final aggregate only. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        col("value").cast("decimal(18,2)").multiply(100).cast("bigint").as("cents"))
    // percentile_disc picks an actual data value but types it double —
    // cast straight back to the exact bigint it is
    val bounds = ev.groupBy("event_type")
      .agg(
        expr("cast(percentile_disc(0.01) WITHIN GROUP (ORDER BY cents) as bigint)")
          .as("lo"),
        expr("cast(percentile_disc(0.99) WITHIN GROUP (ORDER BY cents) as bigint)")
          .as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_type"), col("cents"),
        least(greatest(col("cents"), col("lo")), col("hi")).as("w"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("raw_cents"),
        sum("w").as("winsor_cents"))
  }

  /** Per-group mode (most frequent value, deterministic tiebreak):
    * the modal container per brand — the categorical summary next to
    * the numeric percentiles. Two combiner-backed aggregates + one
    * group-cardinality window; ties break to the lexicographically
    * smallest value so both engines agree. */
  def modePerGroup(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.part(spark, dir)
      .groupBy("p_brand", "p_type").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("p_brand")
      .orderBy(col("c").desc, col("p_type"))
    cnt.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_brand"), col("p_type").as("mode_type"), col("c"))
  }

  /** Exponentially-weighted moving average of daily revenue per
    * event type — the time-series smoothing report, in EXACT integer
    * arithmetic so it hash-gates: e₁ = x₁, eᵢ = (xᵢ + 3·eᵢ₋₁) div 4
    * (α = 1/4 as a dyadic rational; integer recursion is deterministic
    * where float pow(1-α, k) closed forms are not). div TRUNCATES
    * toward zero — measured: DuckDB `-5 // 2 = -2`, same as Scala
    * `/` and Spark SQL `div` — so negative (refund-heavy) daily sums
    * replay identically too, not just the positive common case.
    * The recursion is inherently ordered, so this is the reference's
    * secondary-sort reduce shape done Spark-natively: one daily
    * aggregate (combiner-backed), then a per-type sorted fold via
    * typed groups. State per group is ONE long, and group size is
    * calendar-bounded (days), not data-bounded — at 100 TB the fold
    * input is |types|×|days| rows, trivially small next to the scan. */
  /** CUSUM drift/changepoint detection (Page 1954) over the per-type
    * daily revenue series: the classic one-sided cumulative sum
    * `s_i = max(0, s_{i-1} + (x_i - target))` with alarm when `s`
    * exceeds 3× the mean absolute deviation. The recursion is NOT
    * computed sequentially: `max(0, ·)` folds over (+) form a tropical
    * prefix, and the closed form `s_i = P_i - min(0, min_{j<=i} P_j)`
    * (P = running sum of deviations) turns the sequential scan into
    * TWO ordinary window functions — the shape that parallelizes over
    * a 100 TB event log where a per-partition iterator fold would
    * serialize each series. Exact integer cents end to end (truncating
    * div in both engines) ⇒ oracle-hashable. */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,2)").multiply(100).cast("bigint").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("cents"))
    val tgt = daily.groupBy("event_type").agg(
      expr("sum(cents) div count(1)").as("tgt"),
      count(lit(1)).as("n"))
    val dd = daily.join(broadcast(tgt), "event_type")
      .withColumn("d", col("cents") - col("tgt"))
    val thresh = dd.groupBy("event_type")
      .agg(expr("(3 * sum(abs(d))) div max(n)").as("h"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd.join(broadcast(thresh), "event_type")
      .withColumn("p", sum("d").over(w))
      .withColumn("rm", min("p").over(w))
      .select(col("event_type"), col("day"), col("cents"),
        (col("p") - least(lit(0L), col("rm"))).as("cusum_cents"),
        ((col("p") - least(lit(0L), col("rm"))) > col("h")).as("alarm"))
  }

  def ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,2)").multiply(100).cast("bigint").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("cents"))
      .as[(String, String, Long)]
    daily.groupByKey(_._1)
      .flatMapGroups { (typ, rows) =>
        var e = 0L
        rows.toSeq.sortBy(_._2).zipWithIndex.map { case ((_, day, x), i) =>
          // Scala / truncates toward zero, exactly like DuckDB //
          // (measured -5 // 2 = -2) and Spark SQL div — floorDiv would
          // diverge by one on negative (refund-heavy) daily sums
          e = if (i == 0) x else (x + 3 * e) / 4
          (typ, day, x, e)
        }.iterator
      }
      .toDF("event_type", "day", "cents", "ewma_cents")
  }

  /** Marketing attribution — each purchase's revenue credited to the
    * touch (click/view) that preceded it, under both classic models:
    * FIRST touch (the acquisition channel) and LAST touch (the
    * converting channel); purchases with no preceding touch are
    * 'direct'. The report the reference era ran as a per-user
    * secondary-sort reduce (ref: src/mapred/org/apache/hadoop/mapred/
    * lib/KeyFieldBasedPartitioner.java:1 era jobs); here ONE window
    * pass: per-user event stream ordered by (ts, event_id), running
    * first/last of the touch type over the strictly-preceding frame,
    * then a tiny per-channel aggregate. Revenue in exact integer
    * cents so both engines' sums are order-free and bitwise equal.
    * Scale: one shuffle on user_id (the window), purchases:users is
    * bounded fan-in, final aggregate is channel-cardinality rows. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value").cast("decimal(18,2)").multiply(100).cast("bigint").as("cents"),
        when(col("event_type").isin("click", "view"), col("event_type")).as("touch"))
    val attributed = ev
      .withColumn("first_touch", first(col("touch"), ignoreNulls = true).over(w))
      .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
    attributed
      .select(lit("first_touch").as("model"),
        coalesce(col("first_touch"), lit("direct")).as("channel"), col("cents"))
      .unionByName(attributed
        .select(lit("last_touch").as("model"),
          coalesce(col("last_touch"), lit("direct")).as("channel"), col("cents")))
      .groupBy("model", "channel")
      .agg(count(lit(1)).as("purchases"), sum("cents").as("rev_cents"))
  }

  /** Skyline (Pareto frontier): the parts no other part beats on BOTH
    * size (bigger is better) and price (cheaper is better). The naive
    * formulation is an O(n²) self-anti-join; the scalable plan
    * exploits that one dimension is low-cardinality: collapse to the
    * per-size cheapest price (one combiner-backed aggregate — the map
    * side does nearly all the work), then one window over the
    * size-ordered frontier candidates (rows = |distinct sizes|, not
    * |parts|) keeps a size exactly when its min price undercuts every
    * strictly larger size's. Output is the frontier point set. */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val cand = Tables.part(spark, dir)
      .select(col("p_size"),
        col("p_retailprice").cast("decimal(18,2)").multiply(100)
          .cast("bigint").as("price_cents"))
      .groupBy("p_size").agg(min("price_cents").as("min_cents"))
    val w = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cand.withColumn("best_larger", min(col("min_cents")).over(w))
      .filter(col("best_larger").isNull || col("min_cents") < col("best_larger"))
      .select(col("p_size"), col("min_cents"))
  }

  /** Association rules over order baskets (Agrawal & Srikant 1994,
    * the step after `itemsets`): directed rules a→b with support,
    * confidence and lift, all in exact integer parts-per-million so
    * the rule set hash-gates. Baskets are orders, items are brands
    * (the dimension attribute — pair cardinality is bounded at
    * brands², never parts²). Plan: distinct (order, brand) pairs
    * share one exchange across both sides of the basket self-join
    * (ReuseExchange), fan-out per basket ≤ basket size, and the
    * 1-row basket count broadcasts into the final projection. */
  def assocRules(spark: SparkSession, dir: String,
    minSupportPpm: Long = 5000L, minConfPpm: Long = 100000L): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(Tables.part(spark, dir)
        .select(col("p_partkey").as("l_partkey"), col("p_brand")), "l_partkey")
      .select(col("ok"), col("p_brand").as("item")).distinct()
    val n = baskets.agg(countDistinct("ok").as("n_baskets"))
    val itemCnt = baskets.groupBy("item").agg(count(lit(1)).as("c"))
    val pairs = baskets.select(col("ok"), col("item").as("a"))
      .join(baskets.select(col("ok"), col("item").as("b")), "ok")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
    pairs
      .join(broadcast(itemCnt.select(col("item").as("a"), col("c").as("ca"))), "a")
      .join(broadcast(itemCnt.select(col("item").as("b"), col("c").as("cb"))), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("cab"),
        expr("(1000000 * cab) div n_baskets").as("support_ppm"),
        expr("(1000000 * cab) div ca").as("conf_ppm"),
        // lift's numerator is count³-scale — decimal(38,0) keeps it
        // exact out to ~10¹² baskets, far past 100 TB row counts
        expr("""cast((cast(1000000 as decimal(38,0)) * cab * n_baskets)
                div (cast(ca as decimal(38,0)) * cb) as bigint)""").as("lift_ppm"))
      .filter(col("support_ppm") >= minSupportPpm && col("conf_ppm") >= minConfPpm)
  }

  /** Holt's linear-trend smoothing (double exponential) of daily
    * revenue per event type — EWMA's big sibling: a LEVEL and a TREND
    * recursion, so the forecast follows a drifting series instead of
    * lagging it. Exact integer arithmetic with dyadic α = β = 1/2:
    *   l₁ = x₁, b₁ = 0
    *   lᵢ = (xᵢ + lᵢ₋₁ + bᵢ₋₁) div 2      (α·x + (1-α)·(l+b))
    *   bᵢ = ((lᵢ - lᵢ₋₁) + bᵢ₋₁) div 2    (β·Δl + (1-β)·b)
    * div TRUNCATES toward zero (Scala `/` = DuckDB `//`, measured
    * on negatives: -5 // 2 = -2) so refund-heavy days with negative
    * trend replay identically too. Same distributed shape
    * as `ewma`: one combiner-backed daily aggregate, then a per-type
    * sorted fold whose input is |types|×|days| calendar-bounded rows
    * — trivially small next to the scan at any corpus size. */
  def holt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,2)").multiply(100).cast("bigint").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("cents"))
      .as[(String, String, Long)]
    daily.groupByKey(_._1)
      .flatMapGroups { (typ, rows) =>
        var l = 0L; var b = 0L
        rows.toSeq.sortBy(_._2).zipWithIndex.map { case ((_, day, x), i) =>
          if (i == 0) { l = x; b = 0L }
          else {
            val l2 = (x + l + b) / 2
            b = ((l2 - l) + b) / 2
            l = l2
          }
          (typ, day, x, l, b, l + b)
        }.iterator
      }
      .toDF("event_type", "day", "cents", "level_cents", "trend_cents",
        "forecast_cents")
  }

  /** Robust outlier report: per-priority MEDIAN and MEDIAN ABSOLUTE
    * DEVIATION of order totals in exact integer cents, plus the count
    * of |x − med| > 3·MAD outliers — the robust-statistics screen a
    * curation pipeline runs where mean/stddev would be dragged by the
    * very outliers it hunts. percentile_disc picks an ELEMENT (the
    * same cume_dist ≥ p definition as DuckDB quantile_disc, proven
    * portable by q_percentiles), so every output is bitwise integer.
    * Distributed shape: three combiner-backed aggregates over the
    * scan with the 5-row med/MAD tables broadcast back between them —
    * no per-group window ever holds a group's rows in one task. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").multiply(100)
          .cast("bigint").as("c"))
    // percentile_disc returns DOUBLE in Spark; the selected element is
    // an exact integer cents value, so the cast back is lossless
    val med = o.groupBy("o_orderpriority")
      .agg(expr("cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) as bigint)")
        .as("med_cents"))
    val dev = o.join(broadcast(med), "o_orderpriority")
      .withColumn("dev", abs(col("c") - col("med_cents")))
    val mad = dev.groupBy("o_orderpriority")
      .agg(expr("cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) as bigint)")
        .as("mad_cents"))
    dev.join(broadcast(mad), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(first("med_cents").as("med_cents"),
        first("mad_cents").as("mad_cents"),
        sum(when(col("dev") > lit(3) * col("mad_cents"), 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
  }
}
