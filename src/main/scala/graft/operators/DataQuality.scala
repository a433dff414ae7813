package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Table profiling and data-quality auditing — the ANALYZE TABLE /
  * consistency-check primitives a warehouse runs nightly (the data-
  * layer analog of the reference's filesystem audits; per-column
  * statistics are what its query planner and Hive layer keep per
  * table).
  *
  * Everything is ONE pass where possible: `profile` computes all
  * columns' statistics in a single aggregate (no per-column scan), and
  * `dqChecks` is a union of independent aggregates Catalyst scans
  * share. Min/max render through type-aware normalization so the
  * output is engine-portable (decimals and formatted timestamps, never
  * raw double strings).
  */
object DataQuality {

  /** Type-aware portable string rendering of a min/max value. */
  private def renderStat(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      c.cast("decimal(18,2)").cast("string")
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** Portable per-row string rendering as SQL text (the renderStat
    * rules, usable inside a hash): what both engines agree on
    * byte-for-byte, so md5-based sketches see identical inputs. */
  private[graft] def renderSql(name: String, dt: DataType): String = dt match {
    case DoubleType | FloatType =>
      s"cast(cast($name as decimal(18,2)) as string)"
    case TimestampType | TimestampNTZType =>
      s"date_format($name, 'yyyy-MM-dd HH:mm:ss')"
    case _ => s"cast($name as string)"
  }

  /** Per-column statistics of `orders`: row count, null count,
    * distinct count, min and max, exploded to one row per column — the
    * stats table shape ANALYZE produces. EVERYTHING rides one
    * aggregate over one table scan, and the distinct counts are KMV
    * sketch ESTIMATES by default (`kmv_uniq` over the portable md5 of
    * each column's rendered value): mergeable bounded state, one
    * ordinary pass — the only plan shape that survives 100 TB.
    * `exact = true` is the exact-multi-distinct variant: Catalyst's
    * RewriteDistinctAggregates plans the N distinct columns as a
    * single Expand, which multiplies every row ×N through the
    * shuffle — one scan instead of N+1, but an N× shuffle; measured
    * 4.2× slower than the sketch path already at sf0.1, so it is the
    * opt-in, not the default. Estimates are deterministic (k-th
    * smallest md5) and replayed exactly by the DuckDB oracle. */
  def profile(spark: SparkSession, dir: String,
    exact: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val df = Tables.orders(spark, dir)
    val fields = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val nd =
        if (exact) countDistinct(col(f.name))
        else expr("cast(floor(kmv_uniq(md5(cast(" +
          s"${renderSql(f.name, f.dataType)} as binary)), 256).est) as bigint)")
      Seq(
        count(col(f.name)).as(s"${f.name}__nn"),
        nd.as(s"${f.name}__nd"),
        renderStat(min(col(f.name)), f.dataType).as(s"${f.name}__min"),
        renderStat(max(col(f.name)), f.dataType).as(s"${f.name}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${f.name}__nn")).as("n_null"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__min").as("min_value"),
        col(s"${f.name}__max").as("max_value"))
    }
    wide.select(explode(array(structs: _*)).as("s")).select("s.*")
  }

  /** Referential-integrity and constraint audit over the star schema:
    * duplicate primary keys, orphaned foreign keys (anti joins — at
    * scale these broadcast the bloom of the dimension side), domain
    * violations. One row per check with its violation count — the
    * nightly gate a load pipeline alerts on. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    // each check reduces to a single bigint; union of 1-row frames
    val dupPk = orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
      .select(lit("orders_pk_duplicates").as("check_name"), col("violations"))
    val orphanCust = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_orphan_custkey").as("check_name"), col("violations"))
    val orphanLine = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem_orphan_orderkey").as("check_name"), col("violations"))
    val nullCust = orders.filter(col("o_custkey").isNull)
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_null_custkey").as("check_name"), col("violations"))
    val negPrice = orders.filter(col("o_totalprice") <= 0)
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_nonpositive_price").as("check_name"), col("violations"))
    val badDates = lineitem.filter(col("l_shipdate").isNotNull &&
        col("l_shipdate") < lit("1990-01-01").cast("timestamp"))
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem_shipdate_before_epoch").as("check_name"), col("violations"))
    dupPk.unionByName(orphanCust).unionByName(orphanLine)
      .unionByName(nullCust).unionByName(negPrice).unionByName(badDates)
  }

  /** Deterministic hash-bucket sampling: keep keys whose
    * uint32(md5(key)) lands in the first `pct` of 100 buckets. The
    * 100 TB-sane sampler — no seed coordination across executors, no
    * sampling drift between runs, the SAME rows come back every time
    * and on every engine, and the predicate is a map-side filter that
    * composes with pushdown. (The seeded samplers in `Relational`
    * cover the statistical variants; this is the reproducible-subset
    * variant exact-match pipelines use.) */
  def hashSample(spark: SparkSession, dir: String, pct: Int = 5): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    val bucket = graft.Portable.uint32Sql(
      "md5(cast(cast(o_orderkey as string) as binary))")
    Tables.orders(spark, dir)
      .withColumn("bucket", expr(s"$bucket % 100"))
      .filter(col("bucket") < pct)
      .select(col("o_orderkey"), col("o_custkey"), col("bucket"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
  }

  /** Domain-balanced mixture sampling — the data-mixing step of a
    * training pipeline: each source (domain) is down-sampled toward a
    * per-source document budget, so no domain dominates the mixture.
    * Per-source keep-rates are integer ppm (min(1e6, budget·1e6 ÷
    * count) — no floats, so every engine derives the identical rate),
    * and membership is the same engine-portable md5 bucket used by
    * `hashSample`: reproducible across runs, engines, and corpus
    * repartitionings, and stable under growth (a doc's bucket never
    * changes; only the rate moves as its domain grows). Plan shape:
    * one tiny per-source aggregate broadcast back against the corpus
    * scan — the corpus itself never shuffles, at any scale. */
  def mixSample(spark: SparkSession, dir: String,
    perSource: Int = 15): DataFrame = {
    require(perSource > 0, s"perSource must be positive, got $perSource")
    val docs = Tables.documents(spark, dir)
    val rates = docs.groupBy("source").agg(count(lit(1)).as("c"))
      .select(col("source"),
        least(lit(1000000L), expr(s"$perSource * 1000000 div c")).as("rate_ppm"))
    val bucket = graft.Portable.uint32Sql(
      "md5(cast(cast(doc_id as string) as binary))")
    docs.join(broadcast(rates), Seq("source"))
      .withColumn("b", expr(s"$bucket % 1000000"))
      .filter(col("b") < col("rate_ppm"))
      .select("doc_id", "source", "rate_ppm")
  }

  /** Temperature-weighted mixture sampling (α = 1/2) — the other
    * standard mixing rule: domain weights ∝ count^α flatten the
    * natural distribution toward uniform, so small domains are
    * up-weighted RELATIVE to large ones rather than each capped.
    * Every quantity is an integer: w_s = ⌊√c_s⌋ (IEEE sqrt of an
    * exact int is correctly rounded, so the floor is engine-
    * identical), Σw is an integer sum (order-free, unlike a double
    * sum — the reason α is a rational here), and
    * rate_ppm = min(1e6, total·1e6·w_s ÷ (Σw·c_s)) allocates an
    * expected `total` documents across domains ∝ w. Same portable
    * md5-bucket membership as `mixSample`; same broadcast-back plan
    * shape: the corpus never shuffles. */
  def mixTemperature(spark: SparkSession, dir: String,
    total: Int = 200): DataFrame = {
    require(total > 0, s"total must be positive, got $total")
    val docs = Tables.documents(spark, dir)
    val weights = docs.groupBy("source").agg(count(lit(1)).as("c"))
      .select(col("source"), col("c"),
        // explicit floor: Spark's double→bigint cast truncates but
        // DuckDB's ROUNDS — floor() is the portable spelling
        expr("cast(floor(sqrt(cast(c as double))) as bigint)").as("w"))
    val sumW = weights.agg(sum("w").as("sw"))
    val rates = weights.crossJoin(broadcast(sumW))
      .select(col("source"),
        least(lit(1000000L),
          expr(s"$total * 1000000 * w div (sw * c)")).as("rate_ppm"))
    val bucket = graft.Portable.uint32Sql(
      "md5(cast(cast(doc_id as string) as binary))")
    docs.join(broadcast(rates), Seq("source"))
      .withColumn("b", expr(s"$bucket % 1000000"))
      .filter(col("b") < col("rate_ppm"))
      .select("doc_id", "source", "rate_ppm")
  }

  /** Deterministic stratified train/val/test assignment — the split
    * every training pipeline runs before anything else. Assignment is
    * a pure function of the document id (hash bucket mod 100:
    * [0,trainPct) train, [trainPct,trainPct+valPct) val, rest test),
    * so it is reproducible across runs/engines, stable under corpus
    * growth (old docs never migrate splits when new docs arrive), and
    * a map-side projection at any scale. Emitted per (lang, split)
    * with doc and char counts — the audit a leakage review reads. */
  def trainValTestSplit(spark: SparkSession, dir: String,
    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100 && trainPct >= 0 && valPct >= 0,
      s"invalid split ($trainPct, $valPct)")
    val bucket = graft.Portable.uint32Sql(
      "md5(cast(cast(doc_id as string) as binary))")
    Tables.documents(spark, dir)
      .withColumn("bucket", expr(s"$bucket % 100"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
  }

  /** Proportional stratified sampling with EXACT per-stratum counts —
    * unlike the rate-based samplers above (expected counts), each
    * stratum (language) contributes exactly ⌈n_s·pct/100⌉ documents,
    * selected in deterministic (md5-bucket, doc_id) order so the
    * sample is reproducible across engines and runs. The exact-count
    * guarantee needs a per-stratum rank, which would be a skewed
    * window over full strata (few languages = few partitions); the
    * scale move is a CANDIDATE PREFILTER: only docs whose bucket sits
    * under 2× the target rate enter the window, so the ranked set is
    * ~2× the sample size, not the corpus. For strata ≤ 10⁴ docs the
    * prefilter opens to 100% (binomial tail at 2× rate is only thin
    * for large n; at n > 10⁴ and pct ≥ 1, P(candidates < target) <
    * e^{-n·pct/800} — vanishing). Both engines derive the same
    * threshold from the same exact counts. */
  def stratifiedSample(spark: SparkSession, dir: String, pct: Int = 5): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    val bucket = graft.Portable.uint32Sql(
      "md5(cast(cast(doc_id as string) as binary))")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), expr(s"$bucket % 1000000").as("b"))
    val targets = docs.groupBy("lang").agg(count(lit(1)).as("n_stratum"))
      .select(col("lang"),
        expr(s"(n_stratum * $pct + 99) div 100").as("target"),
        expr(s"IF(n_stratum <= 10000, 1000000, ${pct * 10000 * 2})").as("thr_ppm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("b"), col("doc_id"))
    docs.join(broadcast(targets), "lang")
      .filter(col("b") < col("thr_ppm"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("target"))
      .select(col("doc_id"), col("lang"), col("rn"))
  }

  /** Length-bucketed batch shaping — documents grouped into power-of-2
    * length buckets (the curriculum/batching histogram a sequence-
    * packing scheduler consumes: one bucket ≈ one padding regime).
    * Map-side bucket id + one aggregation; no sort, no window. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // floor(log2) as exact integer bit-length (length(bin(n)) - 1):
      // IEEE ln() rounding at power-of-2 boundaries is not portable
      // across engines; the binary-string length is
      .withColumn("len_bucket",
        expr("cast(length(bin(greatest(n_chars, 1))) - 1 as bigint)"))
      .groupBy("len_bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))

  /** Per-domain document cap — the crawl-curation "no domain may
    * dominate" rule: every source keeps at most the P90 of domain
    * sizes (head domains are trimmed to what a typical domain
    * contributes; the tail passes through untouched). Selection is the
    * portable md5-rank order (deterministic on every engine/run), with
    * doc_id as the total-order tiebreak.
    *
    * Distributed shape: domain sizes are one combiner-backed aggregate
    * (domain-scale rows); the cap is ONE scalar computed from them
    * (percentile_disc over |domains| rows) broadcast back; survivor
    * selection is a per-domain window — partitioned by source, so the
    * frame is one domain, never the corpus. At 100 TB a pathological
    * mega-domain makes that one window partition big; cap survivors
    * are ≤ cap anyway, so pre-filter with the bucket trick (mixSample)
    * if a single domain exceeds task memory. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sizes = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val cap = sizes.agg(
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_src)").as("cap"))
    val hash = graft.Portable.uint32Sql(
      "md5(cast(cast(doc_id as string) as binary))")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(expr(hash), col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(cap))
      .filter(col("rk") <= col("cap"))
      .select(col("doc_id"), col("source"), col("rk").cast("bigint").as("rk"))
  }
}
