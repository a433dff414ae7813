package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Sketches

class SketchSpec extends SparkSpec {

  test("kmv_uniq estimates within 15% of exact; exact below k") {
    val est = Sketches.kmvUniq(spark, sfDir, k = 256).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (t, n) =>
      if (n < 256) assert(est(t) === n, s"below k must be exact for $t")
      else assert(math.abs(est(t) - n) / n < 0.15, s"$t: est=${est(t)} exact=$n")
    }
  }

  test("kmv_uniq is insensitive to partitioning (merge is correct)") {
    GraftFunctions.register(spark)
    val base = Tables.events(spark, sfDir)
      .selectExpr("event_type", "md5(cast(user_id as string)) AS h")
    def run(parts: Int) = base.repartition(parts)
      .groupBy("event_type").agg(expr("kmv_uniq(h, 64)").as("s"))
      .selectExpr("event_type", "s.est", "s.kth").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(run(1) === run(13))
  }

  test("kmv_uniq state is bounded: k entries regardless of input size") {
    GraftFunctions.register(spark)
    // 100k distinct values, k=16 → the partial buffers can only ever
    // hold 16 hashes; correctness of the result implies the trim ran
    val df = spark.range(100000)
      .selectExpr("md5(cast(id as string)) AS h")
      .agg(expr("kmv_uniq(h, 16)").as("s"))
      .selectExpr("s.est")
    val est = df.collect()(0).getDouble(0)
    assert(est > 100000 * 0.4 && est < 100000 * 2.5, s"est=$est")
  }

  test("kmv set algebra approximates exact union/intersection") {
    val r = Sketches.kmvSetOps(spark, sfDir).collect()(0)
    val estU = r.getAs[Double]("est_union")
    val estI = r.getAs[Double]("est_inter")
    val estD = r.getAs[Double]("est_diff")
    val ev = Tables.events(spark, sfDir)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct()
    val exactU = users("click").union(users("view")).distinct().count()
    val exactI = users("click").intersect(users("view")).count()
    assert(math.abs(estU - exactU) / exactU < 0.15, s"union est=$estU exact=$exactU")
    assert(exactI === 0 || math.abs(estI - exactI) / exactI < 0.35,
      s"inter est=$estI exact=$exactI")
    assert(estI <= estU)
    val exactD = users("click").except(users("view")).count()
    assert(exactD === 0 || math.abs(estD - exactD) / exactD < 0.35,
      s"diff est=$estD exact=$exactD")
  }

  test("kmv set algebra still emits one row when a side is empty") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // corpus with clicks only — the view sketch must be empty, not absent.
    // Copy the RAW parquet (nanos-long ts) so Tables.events' timestamp
    // rebuild still applies to the filtered copy.
    val tmp = tmpDir() + "/skempty"
    Tables.events(spark, sfDir) // ensures the nanosAsLong conf is set
    spark.read.parquet(sfDir + "/events.parquet")
      .filter(col("event_type") === "click")
      .write.parquet(tmp + "/events.parquet")
    val r = Sketches.kmvSetOps(spark, tmp).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("inter_cnt") === 0L)
    assert(r(0).getAs[Double]("est_inter") === 0.0)
    assert(r(0).getAs[Double]("est_union") > 0.0)
  }

  test("hll sketches: accuracy and lossless partial merge") {
    val direct = Sketches.hllUniq(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = Sketches.hllRollup(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(direct(t).toDouble - n) / n < 0.05, s"$t direct")
      // merging per-day partials must give the same estimate as one pass
      assert(direct(t) === rolled(t), s"$t rollup != direct")
    }
  }

  test("hist_sketch is merge/partition insensitive, exact-count, clamped") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vals = (1 to 1000).map(i => ((i % 7).toLong * 100 + i % 13) - 50).toDF("v")
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.agg(expr("hist_sketch(v, 50L, 16)").as("h"))
        .collect()(0).getSeq[Long](0)
    val one = hist(vals.coalesce(1))
    val many = hist(vals.repartition(32))
    assert(one === many, "32-way partial merge must equal the single pass")
    assert(one.sum === 1000L, "every value lands in exactly one bucket")
    // negatives clamp into bucket 0, overflow into the last bucket
    val edges = hist(Seq(-5L, -1L, 10_000L).toDF("v"))
    assert(edges.head === 2L && edges.last === 1L)
  }

  test("cms_sketch: merge-insensitive, never underestimates, conserves mass") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val words = (1 to 500).map(i => s"w${i % 37}").toDF("word")
    def cms(df: org.apache.spark.sql.DataFrame) =
      df.agg(expr("cms_sketch(word, 4, 64)").as("c")).collect()(0).getSeq[Long](0)
    val one = cms(words.coalesce(1))
    val many = cms(words.repartition(32))
    assert(one === many, "32-way partial merge must equal the single pass")
    // each of the 4 rows counts every value once
    assert(one.sum === 4L * 500)
    // point estimates never underestimate the true count
    val exact = (1 to 500).groupBy(i => s"w${i % 37}").view.mapValues(_.size.toLong)
    exact.foreach { case (w, n) =>
      val est = (0 until 4).map(r =>
        one(r * 64 + graft.plans.CmsSketch.cell(r, w, 64))).min
      assert(est >= n, s"$w: est $est < exact $n")
    }
  }

  test("mg_topk: Misra-Gries guarantees hold under any partitioning") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // zipf-ish: item i appears ~ 1000/i times — clear heavy tail
    val rows = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
    val n = rows.size.toLong
    val k = 8
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 13)) {
      val out = rows.toDF("w").repartition(parts)
        .agg(expr(s"mg_topk(w, $k)").as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.item"), col("e.est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size <= k, s"summary must hold <= $k items, got ${out.size}")
      // est <= freq <= est + n/(k+1)
      out.foreach { case (item, est) =>
        val freq = exact(item)
        assert(est <= freq, s"$item: est $est > freq $freq (parts=$parts)")
        assert(freq - est <= n / (k + 1),
          s"$item: error ${freq - est} > ${n / (k + 1)} (parts=$parts)")
      }
      // every true heavy hitter (freq > n/(k+1)) is present
      exact.filter(_._2 > n / (k + 1)).keys.foreach { hh =>
        assert(out.contains(hh), s"heavy hitter $hh missing (parts=$parts)")
      }
    }
  }

  test("mg_topk heavy hitters over documents words contain the exact top words") {
    val mg = graft.operators.Sketches.mgHeavyHitters(spark, sfDir, k = 16)
      .collect().map(_.getString(0)).toSet
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(expr(graft.operators.TextOps.normExpr), " ")).as("w"))
      .filter(col("w") =!= "")
    val n = toks.count()
    val top = toks.groupBy("w").count().filter(col("count") > n / 17)
      .collect().map(_.getString(0))
    top.foreach(w => assert(mg.contains(w), s"true heavy word $w missing"))
  }

  test("hist_sketch percentile estimates are within one bucket width of exact") {
    val r = graft.operators.Sketches.histPercentiles(spark, sfDir)
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("m"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    r.collect().foreach { row =>
      val (flag, p50) = (row.getString(0), row.getLong(3))
      val exactCents = exact(flag) * 100
      assert(p50 >= exactCents && p50 - 262144 <= exactCents,
        s"$flag: p50 boundary $p50 not within one width above exact $exactCents")
    }
  }
}
