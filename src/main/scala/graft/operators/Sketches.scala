package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Approximate distinct-count sketches — the scale path for
  * UniqValueCount (ref: src/mapred/org/apache/hadoop/mapred/lib/
  * aggregate/UniqValueCount.java:1), whose exact form (q_agg_uniq)
  * shuffles every distinct value. Both sketches here aggregate to
  * bounded per-group state and MERGE losslessly, so daily partials
  * roll up into monthly totals without touching raw data again — the
  * warehouse pattern the reference runs as chained MapReduce jobs.
  */
object Sketches {

  /** KMV distinct-user estimate per event type (custom
    * TypedImperativeAggregate, plans.KmvUniq): deterministic, so it is
    * oracle-checked bitwise (q_sketch_kmv), k=256 → ~6% standard
    * error with 8 KB state per group. */
  def kmvUniq(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    GraftFunctions.register(spark)
    Tables.events(spark, dir)
      // drop null users BEFORE grouping so a group with only-null users
      // vanishes here exactly as it does in the oracle's filtered CTE
      .filter(col("user_id").isNotNull)
      .selectExpr("event_type", "md5(cast(user_id as string)) AS h")
      .groupBy("event_type")
      .agg(expr(s"kmv_uniq(h, $k)").as("s"))
      .select(col("event_type"), col("s.est").as("est_uniq"), col("s.kth").as("kth_hash"))
  }

  /** KMV sketch SET ALGEBRA: union and intersection distinct-count
    * estimates for click vs view users computed purely from the two
    * stored sketches — never re-reading raw data (the warehouse shape:
    * daily per-segment sketches combined ad hoc). KMV truncation
    * commutes with union (k-min(k-min A ∪ k-min B) = k-min(A∪B)) and
    * any union-sketch member below a side's k-th hash is IN that
    * side's sketch, so both estimates are deterministic and
    * oracle-hashed (q_sketch_ops). */
  def kmvSetOps(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    GraftFunctions.register(spark)
    val nib = graft.Portable.uint32Sql("kth_u")
    // ONE ungrouped aggregate with conditional inputs (aggregates skip
    // nulls): always exactly one output row — even when a side has no
    // events its sketch is just empty, matching the oracle's ungrouped
    // CTEs — and one shuffle instead of groupBy + two filters + join.
    val sk = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view") && col("user_id").isNotNull)
      .selectExpr("event_type", "md5(cast(user_id as string)) AS h")
      .groupBy()
      .agg(
        expr(s"kmv_set(CASE WHEN event_type = 'click' THEN h END, $k)").as("sa"),
        expr(s"kmv_set(CASE WHEN event_type = 'view' THEN h END, $k)").as("sb"))
    sk.select(col("sa.hs").as("ha"), col("sb.hs").as("hb"))
      .withColumn("hu", expr(s"slice(array_sort(array_distinct(concat(ha, hb))), 1, $k)"))
      .withColumn("nu", expr("cast(size(hu) AS BIGINT)"))
      .withColumn("kth_u", expr(s"try_element_at(hu, $k)"))
      .withColumn("inter_cnt", expr(
        "cast(size(filter(hu, x -> array_contains(ha, x) AND array_contains(hb, x))) AS BIGINT)"))
      // greatest(1, ...) mirrors KmvUniq.eval's zero-prefix clamp
      .withColumn("est_union", expr(
        s"CASE WHEN nu < $k THEN cast(nu AS DOUBLE) ELSE (${k - 1}D * 4294967296.0D) / cast(greatest(1, $nib) AS DOUBLE) END"))
      .withColumn("est_inter", expr(
        s"(cast(inter_cnt AS DOUBLE) / least($k, nu)) * est_union"))
      // difference A∖B by the same membership argument
      .withColumn("aonly_cnt", expr(
        "cast(size(filter(hu, x -> array_contains(ha, x) AND NOT array_contains(hb, x))) AS BIGINT)"))
      .withColumn("est_diff", expr(
        s"(cast(aonly_cnt AS DOUBLE) / least($k, nu)) * est_union"))
      .select("nu", "inter_cnt", "aonly_cnt", "est_union", "est_inter", "est_diff")
  }

  /** Mergeable percentile sketch (custom TypedImperativeAggregate,
    * plans.HistSketch) — the bounded-state scale path q_percentiles'
    * exact percentile_disc lacks: per-group state is 64 longs, partials
    * merge by addition, so daily histograms roll up without re-reading
    * raw data. Prices are bucketed in exact integer cents (width 2^18 ≈
    * $2,621); each percentile estimate is the upper boundary of the
    * first bucket whose cumulative count reaches ceil(p·n) — all
    * integer arithmetic, so the DuckDB oracle reproduces it bitwise
    * (q_sketch_percentiles). The rank pass explodes only 64 rows per
    * group (the sketch), never the data. */
  def histPercentiles(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val width = 262144L // 2^18 cents; 64 buckets cover $0..$167,772
    val h = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("cents"))
      .groupBy("l_returnflag")
      .agg(expr(s"hist_sketch(cents, ${width}L, 64)").as("hist"))
    val ex = h.select(col("l_returnflag"), posexplode(col("hist")).as(Seq("b", "c")))
    val byFlag = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
    val cum = ex
      .withColumn("cum", sum("c").over(byFlag.orderBy("b")))
      .withColumn("n", sum("c").over(byFlag))
    def est(p: Int) = min(when(col("cum") >= expr(s"(n * $p + 99) div 100"),
      (col("b") + 1).cast("long") * lit(width))).as(s"p$p")
    cum.groupBy("l_returnflag", "n")
      .agg(est(25), est(50), est(75), est(95))
  }

  /** Count-min frequency probe over document words (custom
    * TypedImperativeAggregate, plans.CmsSketch): one bounded-state
    * sketch (4×1024 longs) replaces the unbounded word-count table;
    * probe estimates are `min` over the probe's 4 cells. Probe cells
    * are computed at PLAN-BUILD time (same md5 derivation as the
    * aggregate), so the readout is a constant-index projection over
    * the sketch array. est >= exact always; the DuckDB oracle rebuilds
    * the identical counter table and reads the same cells
    * (q_sketch_cms). */
  def cmsWordFreq(spark: SparkSession, dir: String,
    probes: Seq[String] = Seq("the", "data", "spark", "xylophone"),
    depth: Int = 4, width: Int = 1024): DataFrame = {
    GraftFunctions.register(spark)
    val toks = Tables.documents(spark, dir)
      .select(explode(split(expr(TextOps.normExpr), " ")).as("word"))
      .filter(col("word") =!= "")
    val sk = toks.agg(expr(s"cms_sketch(word, $depth, $width)").as("cms"))
    val exact = toks.filter(col("word").isin(probes: _*))
      .groupBy("word").agg(count(lit(1)).as("exact"))
    val probeStructs = probes.map { w =>
      val cells = (0 until depth).map(r =>
        s"element_at(cms, ${r * width + graft.plans.CmsSketch.cell(r, w, width) + 1})")
      // probes are caller input — escape quotes so a word like "it's"
      // can't break (or reshape) the generated SQL
      val lw = w.replace("\\", "\\\\").replace("'", "\\'")
      s"struct('$lw' AS word, least(${cells.mkString(", ")}) AS est)"
    }
    sk.selectExpr(s"explode(array(${probeStructs.mkString(", ")})) AS p")
      .select(col("p.word").as("word"), col("p.est").as("est"))
      .join(broadcast(exact), Seq("word"), "left")
      .withColumn("exact", coalesce(col("exact"), lit(0L)))
  }

  /** KMV sketches composed with multi-level OLAP: distinct-user
    * estimates for every CUBE cell of (event_type, day-of-week) in ONE
    * pass — the roll-up report a warehouse runs as one MapReduce job
    * per grouping level, here a single cube aggregate whose per-cell
    * state is a bounded k-hash sketch (partial agg ships sketches, not
    * users, through the shuffle). Deterministic (pure md5 order
    * statistics), so every cell including subtotals hash-matches the
    * DuckDB replay. */
  def kmvCube(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    GraftFunctions.register(spark)
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .selectExpr("event_type",
        "unix_micros(ts) div 86400000000 % 7 AS dow",
        "md5(cast(user_id as string)) AS h")
      .cube(col("event_type"), col("dow"))
      .agg(expr(s"kmv_uniq(h, $k)").as("s"))
      .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("dow"), lit(-1L)).as("dow"),
        col("s.est").as("est_uniq"), col("s.kth").as("kth_hash"))
  }

  /** Heavy-hitter words via the Misra-Gries mergeable summary
    * (plans.MgTopK): ≤ k (item, est) pairs per aggregation buffer
    * regardless of vocabulary size — the bounded-state replacement
    * for an exact word-count table when only the heavy tail matters.
    * Estimates are arrival-order-dependent (guarantee-tested in
    * SketchSpec, not oracle-hashed): est ≤ freq ≤ est + n/(k+1). */
  def mgHeavyHitters(spark: SparkSession, dir: String, k: Int = 32): DataFrame = {
    GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(explode(split(expr(TextOps.normExpr), " ")).as("word"))
      .filter(col("word") =!= "")
      .agg(expr(s"mg_topk(word, $k)").as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item").as("word"), col("e.est").as("est"))
  }

  /** Apache DataSketches HLL (Spark-native hll_sketch_agg): the
    * industry-standard mergeable sketch — smaller state than KMV at
    * the same error, but implementation-defined estimates, so it is
    * ScalaTest-checked for accuracy bounds and merge algebra
    * (SketchSpec), not oracle-hashed. */
  def hllUniq(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("est_uniq"),
        count(lit(1)).as("n"))

  /** The optimizer-driven sketch substitution under the oracle gate:
    * a plain exact `count(DISTINCT cast(user_id as string))` query,
    * rewritten by `plans.ApproxDistinctRewrite` into the KMV estimate.
    * The opt-in is scoped to a CHILD session carrying the
    * `spark.graft.approxDistinct` flag, so the gated result is the
    * flag-gated optimizer rule's output — the oracle replays the
    * k-th-order-statistic estimate, proving the substituted plan
    * computes exactly the documented sketch semantics. Sessions opt
    * in globally by setting the same flag on themselves. */
  def approxDistinct(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    // Per-QUERY opt-in through the same flag the per-session opt-in
    // uses: a child session (shared context, independent SQLConf)
    // carries the flag, and the injected/runtime optimizer rule
    // rewrites the exact plan when THIS DataFrame executes — no
    // eagerly-rewritten plan, no private[sql] DataFrame constructor.
    val scoped = scopedSession(spark, s"approx-distinct-$k") { s =>
      s.conf.set(graft.plans.ApproxDistinctRewrite.flagKey, "true")
      s.conf.set(graft.plans.ApproxDistinctRewrite.kKey, k.toString)
    }
    Tables.events(scoped, dir)
      .filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id").cast("string")).as("uniq_users_est"))
  }

  /** The optimizer-driven PERCENTILE sketch substitution under the
    * oracle gate (q_approx_percentile) — the quantile twin of
    * `approxDistinct`: a plain exact `percentile_disc(p) WITHIN GROUP`
    * query over integer cents, rewritten by
    * `plans.ApproxPercentileRewrite` into the hist_sketch
    * boundary-quantile estimate, via the same child-session flag
    * opt-in as `approxDistinct`, so the gated result is the flag-gated
    * optimizer rule's output; the oracle replays the identical integer
    * histogram + ceil(p·n) rank walk, proving the substituted plan
    * computes exactly the documented estimate. Per-group state is 64
    * longs instead of percentile_disc's every-distinct-value buffer.
    * Sessions opt in globally by setting the flag on themselves. */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame = {
    // same child-session flag opt-in as approxDistinct (no eager
    // rewrite, no private[sql] bridge)
    val scoped = scopedPercentileSession(spark)
    Tables.orders(scoped, dir)
      .select(col("o_orderpriority"),
        expr("cast(round(o_totalprice * 100, 0) as bigint)").as("cents"))
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)").as("p90"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cents)").as("p99"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"), col("p50").cast("long").as("p50"),
        col("p90").cast("long").as("p90"), col("p99").cast("long").as("p99"),
        col("n"))
  }

  /** Child session with the ApproxPercentileRewrite flag set and the
    * gate's histogram geometry: width 2^21 cents (~$21k) × 64 buckets
    * covers order totals to $1.3M. */
  private def scopedPercentileSession(spark: SparkSession): SparkSession =
    scopedSession(spark, "approx-percentile") { s =>
      s.conf.set(graft.plans.ApproxPercentileRewrite.flagKey, "true")
      s.conf.set(graft.plans.ApproxPercentileRewrite.widthKey,
        (1L << 21).toString)
      s.conf.set(graft.plans.ApproxPercentileRewrite.bucketsKey, "64")
    }

  /** One child session per (parent, opt-in key), cached: session
    * construction (fresh SQLConf + lazily-built analyzer/optimizer)
    * costs ~100 ms — real money on a sub-second query called in a
    * loop, pure waste to repeat since the flags never change. */
  private val scopedCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), SparkSession]()
  private def scopedSession(spark: SparkSession, key: String)(
    setup: SparkSession => Unit): SparkSession =
    scopedCache.computeIfAbsent((spark, key), { _ =>
      val s = spark.newSession()
      GraftFunctions.register(s) // runtime hooks for extension-less parents
      setup(s)
      s
    })

  /** The CONTINUOUS (interpolating) twin of `approxPercentile`:
    * exact `percentile(cents, p)` rewritten into the hist_sketch
    * linear-interpolation readout (plans.HistQuantileCont) — rank
    * pos = p·(n−1), estimate interpolates between the bucket upper
    * boundaries at ⌊pos⌋+1 and ⌊pos⌋+2. The whole estimate is fixed
    * IEEE arithmetic over exact integers, so the DuckDB oracle
    * replays it bitwise (q_approx_percentile_cont). */
  def approxPercentileCont(spark: SparkSession, dir: String): DataFrame = {
    val scoped = scopedPercentileSession(spark)
    Tables.orders(scoped, dir)
      .select(col("o_orderpriority"),
        expr("cast(round(o_totalprice * 100, 0) as bigint)").as("cents"))
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(cents, 0.5D)").as("p50"),
        expr("percentile(cents, 0.9D)").as("p90"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"), col("p50").cast("double").as("p50"),
        col("p90").cast("double").as("p90"), col("n"))
  }

  /** Partial-sketch roll-up: per (event_type, day) HLL partials merged
    * to per-type totals with hll_union_agg — the incremental-load
    * shape: yesterday's partials are never recomputed. */
  def hllRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("partial"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(partial, false))").as("est_uniq"))
}
